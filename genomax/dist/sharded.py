"""Sharded (multi-chip) scoring: pairs data-parallel over the mesh,
per-pair results all-gathered over ICI — the reference's inter-alignment
parallelism (one CUDA block per pair, smithWaterman.cu:466 /
pairHMM.cu:616) promoted to the chip level.

Everything runs under shard_map so each chip executes the same wavefront
kernel on its shard of the packed batch; `jax.lax.all_gather` merges the
score vectors. The PairHMM haplotype panel is replicated per chip by
construction (each packed pair row carries its own haplotype stream —
cross-product materialization happens at pack time), matching the
replicated-panel / sharded-reads layout in BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from genomax.config import SWConfig
from genomax.dist.mesh import DATA_AXIS


def _pick(backend: str):
    """Per-shard kernel implementations."""
    if backend == "pallas":
        from genomax.kernels.pairhmm_pallas import pairhmm_forward_pallas
        from genomax.kernels.sw_pallas import sw_forward_pallas

        return sw_forward_pallas, pairhmm_forward_pallas
    return None, None


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "pair_tile", "n_diags", "cfg", "backend", "interpret"),
)
def sw_forward_sharded(
    sx,
    sy,
    nx,
    ny,
    ndiag_tile,
    *,
    mesh,
    pair_tile: int = 8,
    n_diags: int = 0,
    cfg: SWConfig = SWConfig(),
    backend: str = "lax",
    interpret: bool = False,
):
    """Batched SW over a device mesh. The pair dimension (and the per-tile
    diagonal counts) are sharded along the data axis; every chip returns
    its shard's scores and the full vector is all-gathered.

    Row count must divide by (#devices * pair_tile).
    """

    def shard_fn(sx_s, sy_s, nx_s, ny_s, nd_s):
        if backend == "pallas":
            from genomax.kernels.sw_pallas import sw_forward_pallas

            local = sw_forward_pallas(
                sx_s, sy_s, nd_s,
                pair_tile=pair_tile, cfg=cfg, interpret=interpret,
            )
        else:
            from genomax.kernels.wavefront import sw_forward_dense

            local = sw_forward_dense(sx_s, sy_s, nx_s, ny_s, n_diags=n_diags, cfg=cfg)
        # Merge per-chip score shards over ICI.
        return jax.lax.all_gather(local, DATA_AXIS, tiled=True)

    spec = P(DATA_AXIS)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=P(),
        check_rep=False,
    )(sx, sy, nx, ny, ndiag_tile)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "pair_tile", "n_diags", "rescale_period", "backend", "interpret"),
)
def pairhmm_forward_sharded(
    rchar,
    qr,
    mmv,
    gapm,
    qi,
    qd,
    qg,
    hap,
    meta,
    rl,
    hl,
    ndiag_tile,
    *,
    mesh,
    pair_tile: int = 8,
    n_diags: int = 0,
    rescale_period: int = 16,
    backend: str = "lax",
    interpret: bool = False,
):
    """Batched PairHMM forward over a device mesh (see sw_forward_sharded)."""

    def shard_fn(rchar_s, qr_s, mmv_s, gapm_s, qi_s, qd_s, qg_s, hap_s, meta_s,
                 rl_s, hl_s, nd_s):
        if backend == "pallas":
            from genomax.kernels.pairhmm_pallas import pairhmm_forward_pallas

            local = pairhmm_forward_pallas(
                rchar_s, qr_s, mmv_s, gapm_s, qi_s, qd_s, qg_s, hap_s, meta_s,
                nd_s, pair_tile=pair_tile, rescale_period=rescale_period,
                interpret=interpret,
            )
        else:
            from genomax.kernels.wavefront import phmm_forward_dense

            local = phmm_forward_dense(
                rchar_s, qr_s, mmv_s, gapm_s, qi_s, qd_s, qg_s, hap_s,
                rl_s, hl_s, n_diags=n_diags, rescale_period=rescale_period,
            )
        return jax.lax.all_gather(local, DATA_AXIS, tiled=True)

    spec = P(DATA_AXIS)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec,) * 12,
        out_specs=P(),
        check_rep=False,
    )(rchar, qr, mmv, gapm, qi, qd, qg, hap, meta, rl, hl, ndiag_tile)
