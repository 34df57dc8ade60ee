"""Pallas TPU kernel: batched anti-diagonal Smith-Waterman (Gotoh, score
only).

TPU-native successor of the reference's alignGPU CUDA/HIP kernels
(smithWaterman.cu:223-363, hipvers.cpp:214-354). Instead of one thread
block per pair striding a shared-memory diagonal with __syncthreads, each
grid step scores a lane-tile of 128 pairs whose rotating P/Q/D diagonals
live in VMEM as (NXs, 128) sublane-major vectors; the Pallas pipeline
streams the packed sequence tiles HBM→VMEM double-buffered. The longer
sequence is consumed as a reversed diagonal stream read through
dynamic-offset sublane loads (zero shuffle), and the whole DP is
mask-free: boundaries and ragged lengths fall out of the packing's
pad-code decay (proof in kernels/wavefront.py). Per-tile diagonal counts
arrive via scalar prefetch so short tiles exit early.

Measured on v5e: sublane-major runs ~2x the lane-major formulation
(sublane rolls ~1 cyc/vreg vs 3-5 for lane rolls; position padding at
the sublane quantum 8 instead of 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dataclasses

from genomax.config import SWConfig
from genomax.kernels.wavefront import (
    LANES,
    STREAM_CHUNK,
    sw_block,
    sw_make_consts,
    sw_make_state,
)


def _kernel(nd_ref, sx_ref, sy_ref, out_ref, zscr, *, cfg: SWConfig,
            unroll: int, interpret: bool):
    t = pl.program_id(0)
    nd = nd_ref[t]
    nxs = sx_ref.shape[1]

    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    nds = sy_ref.shape[1]

    def window(d):
        return sy_ref[0, pl.ds(nds - nxs - d, nxs), :]

    c = sw_make_consts(sx_ref[0], window, roll1, cfg)

    def outer(i, st):
        return sw_block(i * unroll, st, c, unroll)

    # Zero template round-tripped through VMEM scratch (layout note in
    # sw_make_state).
    zscr[:] = jnp.zeros((nxs, LANES), sx_ref.dtype)
    n_blocks = (nd + unroll - 1) // unroll
    state = jax.lax.fori_loop(0, n_blocks, outer, sw_make_state(zscr[:]))
    score = jnp.max(state[5].astype(jnp.int32), axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(score, out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("cfg", "unroll", "interpret")
)
def sw_forward_pallas(
    sx: jax.Array,  # (NT, NXs, 128) int8/int32 sublane-fixed codes
    sy: jax.Array,  # (NT, NDs, 128) int8/int32 reversed diagonal stream
    ndiag_tile: jax.Array,  # (NT,) int32
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NT, 128) int32 scores (slot-major; see bucketing)."""
    # Codes ship from the host as int8 (4x less transfer) and widen here
    # at HBM bandwidth; the kernel computes in int32.
    sx = sx.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    nt, nxs, _ = sx.shape
    nds = sy.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nxs, LANES), lambda t, nd: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nds, LANES), lambda t, nd: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, nd: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nxs, LANES), sx.dtype)],
    )

    # ~13 VPU ops per cell slot per diagonal.
    cost = pl.CostEstimate(
        flops=int(nt) * int(nxs) * int(nds) * LANES * 13,
        bytes_accessed=int(sx.size + sy.size) * sx.dtype.itemsize,
        transcendentals=0,
    )

    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, unroll=unroll, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, sx, sy)
    return out[::8]


def _kernel_streamed(nd_ref, sx_ref, sy_hbm, out_ref, zscr, slab, sem, *,
                     cfg: SWConfig, unroll: int):
    """Streamed variant: the reversed stream stays in HBM and is DMA'd
    into a double-buffered VMEM slab one STREAM_CHUNK of diagonals at a
    time (pallas_guide double-buffering pattern), so the stream length is
    bounded by HBM, not VMEM — short-read x long-reference alignments
    run on-device instead of offloading. ~15% slower than the
    VMEM-resident kernel on stream-fits workloads (the engine routes by
    buffer size)."""
    t = pl.program_id(0)
    nd = nd_ref[t]
    nxs = sx_ref.shape[1]
    nds = sy_hbm.shape[1]
    chunk = STREAM_CHUNK
    n_sub = chunk // unroll
    span = nxs + chunk
    roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731
    a = nds - nxs  # anchor (pack quantizes it to STREAM_CHUNK)

    c = sw_make_consts(sx_ref[0], None, roll1, cfg)

    def dma(slot, ci):
        # slab for chunk ci covers the windows of diagonals
        # [ci*C, (ci+1)*C): buffer rows [a - (ci+1)C, a - ci*C + nxs)
        return pltpu.make_async_copy(
            sy_hbm.at[t, pl.ds(a - (ci + 1) * chunk, span), :],
            slab.at[pl.ds(slot * span, span), :],
            sem.at[slot],
        )

    dma(0, 0).start()
    n_chunks = (nd + chunk - 1) // chunk

    zscr[:] = jnp.zeros((nxs, LANES), sx_ref.dtype)

    def process(ci, slot, st):
        # slot is a python int -> static slab base in the hot loop;
        # the window reads the slab at offset (chunk - d_within_chunk)
        def block(sb, st):
            cw = dataclasses.replace(
                c,
                window=lambda dd: slab[
                    pl.ds(slot * span + chunk - sb * unroll - dd, nxs), :
                ],
            )
            return sw_block(0, st, cw, unroll)

        return jax.lax.fori_loop(0, n_sub, block, st)

    def pair_body(i, st):
        c0 = 2 * i

        @pl.when(c0 + 1 < n_chunks)
        def _():
            dma(1, c0 + 1).start()

        dma(0, c0).wait()
        st = process(c0, 0, st)

        @pl.when(c0 + 2 < n_chunks)
        def _():
            dma(0, c0 + 2).start()

        @pl.when(c0 + 1 < n_chunks)
        def _w():
            dma(1, c0 + 1).wait()

        return jax.lax.cond(
            c0 + 1 < n_chunks, lambda s: process(c0 + 1, 1, s),
            lambda s: s, st,
        )

    state = jax.lax.fori_loop(
        0, (n_chunks + 1) // 2, pair_body, sw_make_state(zscr[:])
    )
    score = jnp.max(state[5].astype(jnp.int32), axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(score, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("cfg", "unroll", "interpret"))
def sw_forward_pallas_streamed(
    sx: jax.Array,  # (NT, NXs, 128) int8/int32
    sy: jax.Array,  # (NT, NDs, 128) int8/int32 — stays in HBM
    ndiag_tile: jax.Array,  # (NT,) int32
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """sw_forward_pallas with an HBM-resident stream (see
    _kernel_streamed). Requires the pack's STREAM_CHUNK-quantized
    anchor."""
    if STREAM_CHUNK % unroll or unroll > 32:
        raise ValueError(
            f"unroll must be one of 1,2,4,8,16,32 (got {unroll}): it must "
            f"divide the {STREAM_CHUNK}-diagonal DMA chunk and stay within "
            f"the pack's 32-step window slack"
        )
    sx = sx.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    nt, nxs, _ = sx.shape
    nds = sy.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nxs, LANES), lambda t, nd: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stream stays in HBM
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, nd: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nxs, LANES), sx.dtype),
            pltpu.VMEM((2 * (nxs + STREAM_CHUNK), LANES), sx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_streamed, cfg=cfg, unroll=unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ndiag_tile, sx, sy)
    return out[::8]
