"""Single-chip long-pair Smith-Waterman: strip-mined x axis with an HBM
halo FIFO — pairs of (effectively) arbitrary length on one chip.

The VMEM-resident and streamed kernels carry (NXs, 128) state, capping x
at ~1k on v5e (see EngineConfig.max_device_len). Here the x axis is
split into K strips of W sublanes, swept SEQUENTIALLY inside one kernel:

  * strip k sweeps only its live diagonals [kW, kW + ny + W) (plus
    alignment slack) — which also eliminates the anti-diagonal triangle
    waste for huge pairs;
  * the boundary rows (last-sublane D and Q per diagonal) stream through
    two HBM scratch buffers: written slab-wise (one DMA per 256-diagonal
    chunk) by strip k, read back slab-wise by strip k+1 — the single-chip
    analog of dist/xsharded.py's ppermute halo;
  * the y stream is slab-DMA'd from HBM exactly like the streamed
    kernels, so neither sequence length is VMEM-bound;
  * halo buffers are zero-initialized (aliased inputs). Rows a strip
    reads beyond what its left neighbor wrote correspond to cells past
    the matrix; injecting 0 there can only lower already-dead pad cells
    (max-with-0 keeps D >= 0, pads only decay), so scores are exact —
    the same pad-decay reasoning as kernels/wavefront.py.

Measured on v5e: a 50kbp x 50kbp tile (128 lanes) runs 1.43 s warm
= 224 G lane-cells/s with exact native parity (W=104; the round-1
W=512 default ran 2.3 s — vreg spill, DESIGN.md §3b) — the reference C
caps at 1kbp and ~0.05 GCUPS (MAX_LINE_LENGTH 1000,
antidiagonalSmithWaterman.c:44).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.config import SWConfig
from genomax.pack.bucketing import (
    LANES,
    PAD_STREAM,
    PAD_X,
    SUB_Q,
    _full,
    _reject_pad_codes,
    _round_up,
)

CHUNK = 256  # diagonals per slab DMA (stream + halo granularity)
# Default strip width. Small strips keep the carried state out of the
# vreg-spill regime (DESIGN.md 3b): measured on the 50kbp x 50kbp
# point, W=104 runs 224 G lane-cells/s vs 140 at W=512 (W=64 is equal
# within drift; 104 minimizes per-strip sweep slack a bit better).
STRIP_W = 104


def _layout(ny_max: int, w: int):
    """The ONE place the sweep/anchor geometry is computed (pack and
    kernel both call it, so they cannot desynchronize). ny_max is
    CHUNK-quantized first, bounding the number of distinct compiled
    kernel shapes like the bucketing ladder does elsewhere.

    Per strip k the kernel sweeps loop diagonals
    [floor(kW/C)*C, + sweep*C); anchor >= sweep*C keeps the lowest
    stream-window row >= 0, and ndt covers the highest
    (anchor + (kW - c0*C) + W + C <= anchor + W + 2C)."""
    ny_q = _round_up(max(ny_max, 1), CHUNK)
    sweep = -(-(ny_q + 2 * w + 2 * CHUNK) // CHUNK)
    anchor = _round_up(sweep * CHUNK + CHUNK, SUB_Q)
    ndt = _round_up(anchor + w + 2 * CHUNK, SUB_Q)
    return sweep, anchor, ndt


@dataclasses.dataclass
class SWLongPacked:
    """One tile of up to 128 long pairs, x in K strips of W.

    sx : (K*W, 128) int8 sublane-fixed codes (global sublane order)
    sy : (NDt, 128) int8 reversed stream, codes at [A-len, A) with
         A = NDt - W (strip k's window for diagonal d = rows
         [A + k*W - d, ... + W))
    """

    sx: np.ndarray
    sy: np.ndarray
    n_strips: int
    strip_w: int
    n_diags: int
    ny_max: int
    nx: np.ndarray
    ny: np.ndarray
    n_valid: int


def pack_sw_long(pairs, strip_w: int = STRIP_W) -> SWLongPacked:
    """Pack up to 128 long pairs for the strip-mined kernel."""
    assert len(pairs) <= LANES
    w = _round_up(strip_w, SUB_Q)
    k = max(1, -(-(max(len(p.sx) for p in pairs) + 2) // w))
    nd = max(len(p.sx) + len(p.sy) + 1 for p in pairs)
    # CHUNK-quantized BEFORE it becomes the kernel's static arg, so the
    # jit cache keys on the quantized value (bounded compile count).
    ny_max = _round_up(max(len(p.sy) for p in pairs) + 1, CHUNK)
    sweep, anchor, ndt = _layout(ny_max, w)

    sx = _full((k * w, LANES), PAD_X, np.int8)
    sy = _full((ndt, LANES), PAD_STREAM, np.int8)
    nx = np.ones(LANES, np.int32)
    ny = np.ones(LANES, np.int32)
    for l, p in enumerate(pairs):
        _reject_pad_codes(np.frombuffer(p.sx, np.uint8), "sx")
        _reject_pad_codes(np.frombuffer(p.sy, np.uint8), "sy")
        sx[1 : len(p.sx) + 1, l] = np.frombuffer(p.sx, np.uint8)
        sy[anchor - len(p.sy) : anchor, l] = np.frombuffer(p.sy, np.uint8)[::-1]
        nx[l] = len(p.sx) + 1
        ny[l] = len(p.sy) + 1
    return SWLongPacked(
        sx=sx, sy=sy, n_strips=k, strip_w=w, n_diags=nd, ny_max=ny_max,
        nx=nx, ny=ny, n_valid=len(pairs),
    )


def _kernel(sx_hbm, sy_hbm, hd0, hq0, out_ref, hd_hbm, hq_hbm,
            zscr, sxv, slab, hin, hout, houtb, sems, *, cfg: SWConfig, k_strips: int,
            w: int, anchor: int, sweep_chunks: int, unroll: int):
    del hd0, hq0  # aliased to hd_hbm/hq_hbm (zero-initialized by caller)
    og_e = cfg.gap_open + cfg.gap_extend
    ge = cfg.gap_extend
    n_sub = CHUNK // unroll
    span = w + CHUNK
    roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731
    zscr[:] = jnp.zeros((w, LANES), jnp.int32)
    z = zscr[:]
    row0 = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0) == 0

    def strip_body(k, mxrow):
        cp = pltpu.make_async_copy(
            sx_hbm.at[pl.ds(k * w, w), :], sxv, sems.at[0])
        cp.start()
        cp.wait()
        sxb = sxv[:]
        subm = (sxb - sxb) + cfg.match
        subx = (sxb - sxb) + cfg.mismatch
        c0 = (k * w) // CHUNK
        is0 = k == 0

        def stream_dma(slot, ci):
            return pltpu.make_async_copy(
                sy_hbm.at[pl.ds(anchor + k * w - (ci + 1) * CHUNK, span), :],
                slab.at[pl.ds(slot * span, span), :],
                sems.at[1 + slot],
            )

        def hind_dma(slot, ci):
            return pltpu.make_async_copy(
                hd_hbm.at[pl.ds(ci * CHUNK, CHUNK), :],
                hin.at[pl.ds(slot * 2 * CHUNK, CHUNK), :],
                sems.at[3 + slot],
            )

        def hinq_dma(slot, ci):
            return pltpu.make_async_copy(
                hq_hbm.at[pl.ds(ci * CHUNK, CHUNK), :],
                hin.at[pl.ds(slot * 2 * CHUNK + CHUNK, CHUNK), :],
                sems.at[5 + slot],
            )

        stream_dma(0, c0).start()
        hind_dma(0, c0).start()
        hinq_dma(0, c0).start()

        def chunk_body(cc, st):
            ci = c0 + cc
            slot = jax.lax.rem(cc, 2)
            nslot = jax.lax.rem(cc + 1, 2)

            @pl.when(cc + 1 < sweep_chunks)
            def _():
                stream_dma(nslot, ci + 1).start()
                hind_dma(nslot, ci + 1).start()
                hinq_dma(nslot, ci + 1).start()

            stream_dma(slot, ci).wait()
            hind_dma(slot, ci).wait()
            hinq_dma(slot, ci).wait()

            def block(sb, st):
                # Block-granular halo traffic (same pattern as
                # kernels/sw_strips.py): neighbor rows read as one
                # (unroll, 128) slab with static in-block extracts,
                # bottom rows staged in a static-offset scratch and
                # flushed once per block. Measured equal to the per-step
                # single-row form on v5e (within drift); kept for the
                # bounded dynamic-addressing structure.
                P1, D1, D1s, Q1s, D2s, mx = st
                hdblk = jnp.where(
                    is0, 0,
                    hin[pl.ds(slot * 2 * CHUNK + sb * unroll, unroll), :])
                hqblk = jnp.where(
                    is0, 0,
                    hin[pl.ds(slot * 2 * CHUNK + CHUNK + sb * unroll,
                              unroll), :])
                for tt in range(unroll):
                    # loop diagonal d = ci*CHUNK + sb*unroll + tt
                    off = CHUNK - sb * unroll - tt
                    syw = slab[pl.ds(slot * span + off, w), :]
                    Pn = jnp.maximum(D1, P1 + ge)
                    Qn = jnp.maximum(D1s, Q1s + ge)
                    sub = jnp.where(syw == sxb, subm, subx)
                    Dn = jnp.maximum(jnp.maximum(Pn, Qn) + og_e,
                                     jnp.maximum(D2s + sub, 0))
                    mx = jnp.maximum(mx, Dn)
                    houtb[tt : tt + 1, :] = Dn[w - 1 : w, :]
                    houtb[unroll + tt : unroll + tt + 1, :] = Qn[w - 1 : w, :]
                    D1sn = jnp.where(row0, hdblk[tt : tt + 1, :], roll1(Dn))
                    Q1sn = jnp.where(row0, hqblk[tt : tt + 1, :], roll1(Qn))
                    P1, D1, D1s, Q1s, D2s = Pn, Dn, D1sn, Q1sn, D1s
                hout[pl.ds(sb * unroll, unroll), :] = houtb[:unroll, :]
                hout[pl.ds(CHUNK + sb * unroll, unroll), :] = houtb[unroll:, :]
                return (P1, D1, D1s, Q1s, D2s, mx)

            st = jax.lax.fori_loop(0, n_sub, block, st)
            od = pltpu.make_async_copy(
                hout.at[pl.ds(0, CHUNK), :],
                hd_hbm.at[pl.ds(ci * CHUNK, CHUNK), :], sems.at[7])
            oq = pltpu.make_async_copy(
                hout.at[pl.ds(CHUNK, CHUNK), :],
                hq_hbm.at[pl.ds(ci * CHUNK, CHUNK), :], sems.at[8])
            od.start()
            oq.start()
            od.wait()
            oq.wait()
            return st

        st = jax.lax.fori_loop(0, sweep_chunks, chunk_body, (z, z, z, z, z, z))
        return jnp.maximum(mxrow, jnp.max(st[5], axis=0, keepdims=True))

    mxrow = jax.lax.fori_loop(0, k_strips, strip_body, z[0:1])
    out_ref[:] = jnp.broadcast_to(mxrow, out_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("k_strips", "strip_w", "ny_max", "cfg", "unroll",
                     "interpret"),
)
def sw_forward_pallas_long(
    sx: jax.Array,  # (K*W, 128) int8/int32
    sy: jax.Array,  # (NDt, 128) int8/int32
    *,
    k_strips: int,
    strip_w: int,
    ny_max: int,
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Returns (128,) int32 scores for one tile of long pairs. The
    sweep/anchor geometry derives from _layout (shared with the pack),
    and ny_max is CHUNK-quantized inside it, so distinct compiled shapes
    are bounded rather than one-per-length."""
    if CHUNK % unroll or unroll > 32:
        raise ValueError(f"unroll must divide {CHUNK} and be <= 32")
    sx = sx.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    w = strip_w
    sweep_chunks, anchor, ndt = _layout(ny_max, w)
    assert sy.shape[0] == ndt, (sy.shape, ndt)
    nhalo = -(-((k_strips - 1) * w + (sweep_chunks + 1) * CHUNK) // CHUNK) * CHUNK

    f = pl.pallas_call(
        functools.partial(
            _kernel, cfg=cfg, k_strips=k_strips, w=w, anchor=anchor,
            sweep_chunks=sweep_chunks, unroll=unroll,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((8, LANES), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((w, LANES), jnp.int32),  # zeros template
                pltpu.VMEM((w, LANES), jnp.int32),  # strip x codes
                pltpu.VMEM((2 * (w + CHUNK), LANES), jnp.int32),  # stream
                pltpu.VMEM((2 * 2 * CHUNK, LANES), jnp.int32),  # halo in
                pltpu.VMEM((2 * CHUNK, LANES), jnp.int32),  # halo out
                pltpu.VMEM((2 * unroll, LANES), jnp.int32),  # block halo-out
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={2: 1, 3: 2},
        interpret=interpret,
    )
    zh = jnp.zeros((nhalo, LANES), jnp.int32)
    out, _, _ = f(sx, sy, zh, zh)
    return out[0]


def sw_scores_long(pairs, cfg: SWConfig = SWConfig(), strip_w: int = STRIP_W,
                   interpret: bool = False) -> np.ndarray:
    """Scores for arbitrarily long SWPair jobs (tiles of 128 per call)."""
    out = np.zeros(len(pairs), np.int32)
    for base in range(0, len(pairs), LANES):
        tile = pairs[base : base + LANES]
        b = pack_sw_long(tile, strip_w)
        got = np.asarray(
            sw_forward_pallas_long(
                jnp.asarray(b.sx),
                jnp.asarray(b.sy),
                k_strips=b.n_strips,
                strip_w=b.strip_w,
                ny_max=b.ny_max,
                cfg=cfg,
                interpret=interpret,
            )
        )
        out[base : base + len(tile)] = got[: len(tile)]
    return out
