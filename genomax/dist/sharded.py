"""Sharded (multi-chip) scoring: pair tiles data-parallel over the mesh,
per-pair results all-gathered over ICI — the reference's inter-alignment
parallelism (one CUDA block per pair, smithWaterman.cu:466 /
pairHMM.cu:616) promoted to the chip level.

Everything runs under shard_map so each chip executes the same wavefront
kernel on its shard of the packed tile batch (the leading NT dim of the
sublane-major tiles); `jax.lax.all_gather` merges the (NT, 128) score
tiles. The PairHMM haplotype panel is replicated per chip by construction
(each packed pair slot carries its own haplotype stream — cross-product
materialization happens at pack time), matching the replicated-panel /
sharded-reads layout in BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


from genomax.config import SWConfig
from genomax.dist.mesh import DATA_AXIS, shard_map_compat
from genomax.engine.executor import flatten_tiles


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_diags", "cfg", "unroll", "backend", "interpret",
        "stream_vmem_rows", "strips", "rotor",
    ),
)
def sw_forward_sharded(
    sx,  # (NT, NXs, 128) — K*W rows when strips is set; the rotor's
    # (NT_r, NB, 128) xrev stream when rotor is set
    sy,  # (NT, NDs, 128) — the rotor's (NT_r, NY, 128) ybuf when set
    nx,
    ny,
    ndiag_tile,  # (NT,)
    *,
    mesh,
    n_diags: int = 0,
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    backend: str = "lax",
    interpret: bool = False,
    stream_vmem_rows: int = 6144,
    strips: tuple | None = None,  # (k_strips, strip_w, anchor) from
    # sw_strips.prep_bucket_strips; ny then carries the per-tile max-ny
    nyt_tile=None,  # (NT,) int32 when strips is set
    rotor: tuple | None = None,  # (period, n_slots, anchor, unroll)
    # from sw_rotor.prep_bucket_rotor; sx/sy then carry xrev/ybuf and
    # the prep guarantees the rotor tile count divides the mesh
):
    """Batched SW over a device mesh. The tile dimension (and the per-tile
    diagonal counts) are sharded along the data axis; every chip returns
    its shard's (NT_local, 128) scores and the full tile batch is
    all-gathered. NT must divide by #devices. Long-stream buckets route
    to the HBM-streamed kernel and mid/large buckets to the strip-mined
    kernel, like the single-chip engine."""

    def shard_fn(sx_s, sy_s, nx_s, ny_s, nd_s, nyt_s):
        if backend == "pallas":
            from genomax.kernels.sw_pallas import (
                sw_forward_pallas,
                sw_forward_pallas_streamed,
            )
            from genomax.kernels.sw_strips import sw_forward_pallas_strips

            if rotor is not None:
                from genomax.kernels.sw_rotor import (
                    sw_forward_pallas_rotor_bucket,
                )

                T_, P_, A_, u_ = rotor
                local = sw_forward_pallas_rotor_bucket(
                    sx_s, sy_s, cfg=cfg, period=T_, n_slots=P_,
                    anchor=A_, unroll=u_, interpret=interpret,
                )
            elif strips is not None:
                k_strips, strip_w, anchor = strips
                local = sw_forward_pallas_strips(
                    sx_s, sy_s, nd_s, nyt_s,
                    k_strips=k_strips, strip_w=strip_w, anchor=anchor,
                    cfg=cfg, unroll=unroll, interpret=interpret,
                )
            else:
                fn = (
                    sw_forward_pallas_streamed
                    if sy_s.shape[1] > stream_vmem_rows
                    else sw_forward_pallas
                )
                local = fn(
                    sx_s, sy_s, nd_s, cfg=cfg, unroll=unroll,
                    interpret=interpret,
                )
        else:
            from genomax.kernels.wavefront import sw_forward_dense

            local = sw_forward_dense(
                flatten_tiles(sx_s), flatten_tiles(sy_s), nx_s, ny_s,
                n_diags=n_diags, cfg=cfg,
            ).reshape(sx_s.shape[0], 128)
        # Merge per-chip score tile shards over ICI.
        return jax.lax.all_gather(local, DATA_AXIS, tiled=True)

    spec = P(DATA_AXIS)
    if nyt_tile is None:
        import jax.numpy as jnp

        nyt_tile = jnp.zeros_like(ndiag_tile)
    return shard_map_compat(
        shard_fn, mesh, (spec, spec, spec, spec, spec, spec), P()
    )(sx, sy, nx, ny, ndiag_tile, nyt_tile)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_diags", "rescale_period", "backend", "interpret",
        "stream_vmem_rows", "mm_div", "bitmask",
    ),
)
def pairhmm_forward_sharded(
    rchar,  # (NT, NXs, 128)
    qr,
    mmv,
    gapm,
    qi,
    qd,
    qg,
    hap,  # (NT, NDs, 128)
    meta,  # (NT, 8, 128)
    rl,  # (NT*128,)
    hl,
    ndiag_tile,  # (NT,)
    *,
    mesh,
    n_diags: int = 0,
    rescale_period: int = 16,
    backend: str = "lax",
    interpret: bool = False,
    stream_vmem_rows: int = 6144,
    mm_div: float = 1.0,
    bitmask: bool = False,
):
    """Batched PairHMM forward over a device mesh (see sw_forward_sharded)."""

    def shard_fn(rchar_s, qr_s, mmv_s, gapm_s, qi_s, qd_s, qg_s, hap_s, meta_s,
                 rl_s, hl_s, nd_s):
        if backend == "pallas":
            from genomax.kernels.pairhmm_pallas import (
                pairhmm_forward_pallas,
                pairhmm_forward_pallas_streamed,
            )

            fn = (
                pairhmm_forward_pallas_streamed
                if hap_s.shape[1] > stream_vmem_rows
                else pairhmm_forward_pallas
            )
            local = fn(
                rchar_s, qr_s, mmv_s, gapm_s, qi_s, qd_s, qg_s, hap_s, meta_s,
                nd_s, rescale_period=rescale_period, interpret=interpret,
                mm_div=mm_div,
                bitmask=bitmask,
            )
        else:
            from genomax.kernels.wavefront import phmm_forward_dense

            local = phmm_forward_dense(
                flatten_tiles(rchar_s), flatten_tiles(qr_s),
                flatten_tiles(mmv_s), flatten_tiles(gapm_s),
                flatten_tiles(qi_s), flatten_tiles(qd_s),
                flatten_tiles(qg_s), flatten_tiles(hap_s),
                rl_s, hl_s, n_diags=n_diags, rescale_period=rescale_period,
                mm_div=mm_div,
                bitmask=bitmask,
            ).reshape(rchar_s.shape[0], 128)
        return jax.lax.all_gather(local, DATA_AXIS, tiled=True)

    spec = P(DATA_AXIS)
    return shard_map_compat(
        shard_fn, mesh, (spec,) * 12, P()
    )(rchar, qr, mmv, gapm, qi, qd, qg, hap, meta, rl, hl, ndiag_tile)
