"""Pallas TPU kernel: batched PairHMM forward (fp32 + exponent tracking).

TPU-native successor of align1thread (pairHMM.cu:249-368): one sublane-tile
of read×haplotype pairs per grid step, M/X/Y rotating diagonals as VMEM
lane vectors, haplotype chars consumed as a reversed diagonal stream
rotated one lane per step, all per-base quality arrays lane-fixed. The
reference needs fp64 and a DBL_MAX/16 scaling constant; the TPU kernel
runs fp32 with a per-pair power-of-two exponent shift (see
kernels/wavefront.py docstring), rescaled once per unrolled block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.kernels.wavefront import (
    phmm_finalize,
    phmm_make_consts,
    phmm_make_state,
    phmm_rescale,
    phmm_step,
    wavefront_sweep,
)


def _kernel(
    nd_ref,
    rchar_ref,
    qr_ref,
    mmv_ref,
    gapm_ref,
    qi_ref,
    qd_ref,
    qg_ref,
    hap_ref,
    meta_ref,
    out_ref,
    zscr,
    *,
    unroll: int,
    interpret: bool,
):
    t = pl.program_id(0)
    nd = nd_ref[t]
    b, nxp = rchar_ref.shape

    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=1)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=1)  # noqa: E731

    meta = meta_ref[:]
    c = phmm_make_consts(
        rchar_ref[:],
        qr_ref[:],
        mmv_ref[:],
        gapm_ref[:],
        qi_ref[:],
        qd_ref[:],
        qg_ref[:],
        meta[:, 0:1],
        meta[:, 1:2],
        roll1,
    )

    def body(d, state):
        return phmm_step(d, state, c)

    def block(state, d):
        return phmm_rescale(state, d, c)

    zscr[:] = jnp.zeros((b, nxp), jnp.float32)
    state = wavefront_sweep(
        nd, phmm_make_state(hap_ref[:], zscr[:]), body, unroll=unroll,
        block_fn=block,
    )
    res = phmm_finalize(state).reshape(b, 1)
    out_ref[:] = jnp.broadcast_to(res, out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("pair_tile", "rescale_period", "interpret")
)
def pairhmm_forward_pallas(
    rchar: jax.Array,  # (NP, NX) int32 lane-fixed read codes
    qr: jax.Array,  # (NP, NX) f32 — and mmv/gapm/qi/qd/qg likewise
    mmv: jax.Array,
    gapm: jax.Array,
    qi: jax.Array,
    qd: jax.Array,
    qg: jax.Array,
    hap: jax.Array,  # (NP, ND) int32 reversed diagonal stream
    meta: jax.Array,  # (NP, 128) int32: lane0=read_len, lane1=hap_len
    ndiag_tile: jax.Array,  # (NP // pair_tile,) int32
    pair_tile: int = 32,
    rescale_period: int = 8,  # == the unrolled block length
    interpret: bool = False,
) -> jax.Array:
    """Returns (NP,) f32 log10 likelihoods (reference-constant-relative)."""
    n_pairs, nxp = rchar.shape
    ndp = hap.shape[1]
    assert n_pairs % pair_tile == 0
    n_tiles = n_pairs // pair_tile
    b = pair_tile

    def vspec(lanes):
        return pl.BlockSpec((b, lanes), lambda t, nd: (t, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            vspec(nxp),  # rchar
            vspec(nxp),  # qr
            vspec(nxp),  # mmv
            vspec(nxp),  # gapm
            vspec(nxp),  # qi
            vspec(nxp),  # qd
            vspec(nxp),  # qg
            vspec(ndp),  # hap (reversed stream)
            vspec(128),  # meta
        ],
        out_specs=vspec(128),
        scratch_shapes=[pltpu.VMEM((pair_tile, nxp), jnp.float32)],
    )

    cost = pl.CostEstimate(
        flops=int(n_pairs) * int(nxp) * int(ndp) * 30,
        bytes_accessed=int(rchar.size * 8 + hap.size) * 4,
        transcendentals=int(n_pairs),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, unroll=rescale_period, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pairs, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, rchar, qr, mmv, gapm, qi, qd, qg, hap, meta)
    return out[:, 0]
