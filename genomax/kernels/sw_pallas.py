"""Pallas TPU kernel: batched anti-diagonal Smith-Waterman (Gotoh, score
only).

TPU-native successor of the reference's alignGPU CUDA/HIP kernels
(smithWaterman.cu:223-363, hipvers.cpp:214-354). Instead of one thread
block per pair striding a shared-memory diagonal with __syncthreads, each
grid step scores a sublane-tile of pairs whose rotating P/Q/D diagonals
live in VMEM as (pair_tile, NX) lane vectors; the Pallas pipeline streams
the packed sequence tiles HBM→VMEM double-buffered. The longer sequence
is consumed as a reversed diagonal stream rotated one lane per step, and
the whole DP runs in int16 when lengths permit (2x VPU throughput; see
kernels/wavefront.py for the soft-sentinel equivalence proof). Per-tile
diagonal counts arrive via scalar prefetch so short tiles exit early.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.config import SWConfig
from genomax.kernels.wavefront import (
    sw_make_consts,
    sw_make_state,
    sw_step,
    wavefront_sweep,
)


def _kernel(nd_ref, sx_ref, sy_ref, out_ref, zscr, *, cfg: SWConfig,
            unroll: int, interpret: bool):
    t = pl.program_id(0)
    nd = nd_ref[t]
    b, nxp = sx_ref.shape

    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=1)
    elif sx_ref.dtype == jnp.int16:
        # tpu.dynamic_rotate only supports 32-bit data; int16 rotates are
        # expressed as slice+concat instead.
        roll1 = lambda x: jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)  # noqa: E731
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=1)  # noqa: E731

    c = sw_make_consts(sx_ref[:], roll1, cfg)

    def body(d, state):
        return sw_step(d, state, c)

    # Zero template round-tripped through VMEM scratch (layout note in
    # sw_make_state).
    zscr[:] = jnp.zeros((b, nxp), sx_ref.dtype)
    state = wavefront_sweep(nd, sw_make_state(sy_ref[:], zscr[:]), body, unroll)
    # int16 reductions aren't implemented in Mosaic; widen first (once per tile).
    score = jnp.max(state[6].astype(jnp.int32), axis=1, keepdims=True)
    out_ref[:] = jnp.broadcast_to(score, out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("pair_tile", "cfg", "unroll", "interpret")
)
def sw_forward_pallas(
    sx: jax.Array,  # (NP, NX) int16/int32, lane-fixed (lane j = sx[j-1])
    sy: jax.Array,  # (NP, ND) same dtype, reversed diagonal stream
    ndiag_tile: jax.Array,  # (NP // pair_tile,) int32
    pair_tile: int = 32,
    cfg: SWConfig = SWConfig(),
    unroll: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NP,) int32 scores."""
    n_pairs, nxp = sx.shape
    ndp = sy.shape[1]
    assert n_pairs % pair_tile == 0
    n_tiles = n_pairs // pair_tile
    b = pair_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, nxp), lambda t, nd: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, ndp), lambda t, nd: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, 128), lambda t, nd: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((pair_tile, nxp), sx.dtype)],
    )

    # ~23 VPU ops per lane per diagonal.
    cost = pl.CostEstimate(
        flops=int(n_pairs) * int(nxp) * int(ndp) * 23,
        bytes_accessed=int(sx.size + sy.size) * sx.dtype.itemsize,
        transcendentals=0,
    )

    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, unroll=unroll, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pairs, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, sx, sy)
    return out[:, 0]
