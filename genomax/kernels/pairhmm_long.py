"""Single-chip long-read PairHMM: strip-mined read axis with an HBM
halo FIFO — reads of (effectively) arbitrary length on one chip.

The lane-tile PairHMM kernels carry ~11 (NXs, 128) fp32 arrays plus 7
quality constants, capping reads at ~512 on v5e's ~16 MB VMEM (the
reference runs reads to MAX_READ_LEN 1000, pairHMM/pairHMMmatrix.c:8).
Here the read axis is split into K strips of W sublane rows swept
SEQUENTIALLY inside one kernel, with the same chunked-DMA structure as
kernels/sw_long.py: per-strip quality constants and the reversed
haplotype stream slab-DMA from HBM, and the strip-boundary rows of the
three shifted carries (M, X, Y — the only state that crosses rows)
stream through HBM halo buffers written/read chunk-wise.

**Cross-strip exponent reconciliation** (the part SW does not need):
each strip runs the fp32 exponent-rescale scheme of
kernels/wavefront.py over its OWN window, so adjacent strips can sit in
different power-of-2**80 frames. A fourth halo carries the writer's
per-lane rescale COUNT per diagonal; the reader:

  * snaps its frame to the incoming count at strip start (strip 0
    starts at count 0 — the base frame);
  * never lets a reader run DEEPER than its writer's frame (up-rescales
    are gated on cnt < the writer's current count; strip 0 — the global
    frame reference — rescales freely). Without the gate a strip whose
    local window holds only negligible mass (~10^-400) would rescale
    ahead, and the tall mass later arriving laterally from its writer
    would need an up-conversion beyond fp32 range (measured). Gated
    flushes lose only mass >= 86 orders below the lateral inflow;
  * converts every injected halo row by 2**(80*(cnt_r - cnt_w)) — with
    the gate, always a DOWN-conversion (delta <= 0) — applied as two
    2**(40*d) multiplies with d clipped at -3: the writer can be
    legitimately deeper by several rescales (its window decays once the
    alignment moves past it), and anything beyond 2**-240 underflows to
    an exact, truly negligible 0;
  * carries the likelihood accumulator with its own frame count
    (acc_cnt): while the accumulator is empty it snaps to the current
    strip's frame, afterwards the standard follow/freeze logic of
    phmm_rescale applies, and the final log10 shift is
    -acc_cnt * log10(2**80). Only the strip owning sublane row
    read_len ever accumulates (the result-row mask is global), so the
    accumulator sees exactly one strip's contribution sequence, in the
    reference's increasing-j order (antidiagsPairHMM.c:206-212).

Zero-initialized halos (aliased inputs) are exact: M/X/Y are zero at
every out-of-matrix cell (pad-decay, kernels/wavefront.py), so rows a
strip reads beyond what its neighbor wrote inject the true dead value.

Geometry (sweep/anchor/ndt) is shared with kernels/sw_long.py via
_layout so pack and kernel cannot desynchronize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.io.phred import phred_to_error_prob
from genomax.kernels.sw_long import CHUNK, _layout
from genomax.kernels.wavefront import (
    PHMM_INIT_LOG2,
    PHMM_INIT_LOG10,
    PHMM_RESCALE_FACTOR,
    PHMM_RESCALE_LOG10,
    PHMM_RESCALE_TRIGGER,
    _N_CODE,
)
from genomax.pack.bucketing import (
    LANES,
    PAD_STREAM,
    PAD_X,
    SUB_Q,
    _full,
    _reject_bad_read,
    _reject_pad_codes,
    _round_up,
)

# Default strip width: W=256 measured fastest on 2048x2048 tiles
# (99 ms vs 124 at 512, 107 at 104 — PairHMM's ~190 cyc/step latency
# floor penalizes very narrow strips, vreg spill penalizes wide ones;
# see DESIGN.md §3b) and compiles ~10x faster than 512.
STRIP_W = 256


def pack_pairhmm_long(jobs, phred_offset: float = 33.0, strip_w: int = STRIP_W):
    """Pack up to 128 (read, haplotype) jobs for the strip-mined kernel.

    jobs: list of (PairHMMRead, bytes-haplotype). Returns
    (arrays-dict, statics-dict) ready for pairhmm_forward_pallas_long.
    """
    assert len(jobs) <= LANES
    w = _round_up(strip_w, SUB_Q)
    k = max(1, -(-(max(len(rd.bases) for rd, _ in jobs) + 2) // w))
    ny_max = _round_up(max(len(h) for _, h in jobs) + 1, CHUNK)
    sweep, anchor, ndt = _layout(ny_max, w)

    # qual: 6 stacked (K*W, 128) blocks (qr, mmv, gapm, qi, qd, qg) in
    # one 2D array so per-strip slices are plain 2D row-range DMAs.
    rchar = _full((k * w, LANES), PAD_X, np.int8)
    qual = np.zeros((6 * k * w, LANES), np.float32)
    hap = _full((ndt, LANES), PAD_STREAM, np.int8)
    meta = np.zeros((8, LANES), np.int32)
    meta[1, :] = 1  # hl for dead lanes
    kw = k * w
    for l, (rd, h) in enumerate(jobs):
        L = len(rd.bases)
        _reject_bad_read(rd, phred_offset)
        _reject_pad_codes(np.frombuffer(rd.bases, np.uint8), "read bases")
        _reject_pad_codes(np.frombuffer(h, np.uint8), "haplotype")
        rchar[1 : L + 1, l] = np.frombuffer(rd.bases, np.uint8)
        qr = phred_to_error_prob(np.frombuffer(rd.base_q, np.uint8), phred_offset)
        qi = phred_to_error_prob(np.frombuffer(rd.ins_q, np.uint8), phred_offset)
        qd = phred_to_error_prob(np.frombuffer(rd.del_q, np.uint8), phred_offset)
        qg = phred_to_error_prob(np.frombuffer(rd.gcp_q, np.uint8), phred_offset)
        for j, v in enumerate((qr, 1.0 - (qi + qd), 1.0 - qg, qi, qd, qg)):
            qual[j * kw + 1 : j * kw + L + 1, l] = v
        hap[anchor - len(h) : anchor, l] = np.frombuffer(h, np.uint8)[::-1]
        meta[0, l] = L
        meta[1, l] = len(h)
    arrays = dict(rchar=rchar, qual=qual, hap=hap, meta=meta)
    statics = dict(k_strips=k, strip_w=w, ny_max=ny_max)
    return arrays, statics


def _kernel(rchar_hbm, qual_hbm, hap_hbm, meta_ref, hM0, hX0, hY0, hC0,
            out_ref, hM_hbm, hX_hbm, hY_hbm, hC_hbm,
            zscr, rcv, qv, slab, hin, hout, sems, *,
            k_strips: int, w: int, anchor: int, sweep_chunks: int,
            unroll: int, interpret: bool, mm_div: float):
    del hM0, hX0, hY0, hC0  # aliased to h*_hbm (zero-initialized)
    n_sub = CHUNK // unroll
    span = w + CHUNK
    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    zscr[:] = jnp.zeros((w, LANES), jnp.float32)
    z = zscr[:]
    zrow = z[0:1]
    rl = meta_ref[0:1, :]
    hl = meta_ref[1:2, :]
    rlhl = rl + hl
    row0 = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0) == 0
    iil = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0)

    def strip_body(k, carry):
        acc, acc_cnt = carry
        # --- per-strip constants: DMA the strip's quality/code rows ---
        cp = pltpu.make_async_copy(
            rchar_hbm.at[pl.ds(k * w, w), :], rcv, sems.at[0])
        cp.start()
        cp.wait()
        kw_total = k_strips * w
        for j in range(6):
            cq = pltpu.make_async_copy(
                qual_hbm.at[pl.ds(j * kw_total + k * w, w), :],
                qv.at[pl.ds(j * w, w), :],
                sems.at[0],
            )
            cq.start()
            cq.wait()
        rchar = rcv[:]
        qr, mmv, gapm, qi, qd, qg = (
            qv[j * w : (j + 1) * w, :] for j in range(6))
        ii = iil + k * w  # global sublane row index
        dead = (ii == 0) | (ii > rl)
        pm = jnp.where(dead, 0.0, 1.0 - qr)
        # read-'N' wildcard folded into qr; row-0 Y persistence via
        # qg[0]=1 (see wavefront.PhmmConsts) — row 0 is global, so only
        # strip 0 carries the boundary constant in its Y1 init.
        qr = jnp.where(dead, 0.0,
                       jnp.where(rchar == _N_CODE, 1.0 - qr,
                                 qr * (1.0 / mm_div)))
        qg = jnp.where(ii == 0, 1.0, qg)
        rlmask = ii == rl
        y0 = (2.0**PHMM_INIT_LOG2) / jnp.maximum(hl, 1).astype(jnp.float32)
        y0row = jnp.where(ii == 0, y0, 0.0)
        c0 = (k * w) // CHUNK
        is0 = k == 0

        def stream_dma(slot, ci):
            return pltpu.make_async_copy(
                hap_hbm.at[pl.ds(anchor + k * w - (ci + 1) * CHUNK, span), :],
                slab.at[pl.ds(slot * span, span), :],
                sems.at[1 + slot],
            )

        def hin_dma(ci):
            # single-buffered: 4 small copies (M, X, Y, cnt), one chunk
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(ci * CHUNK, CHUNK), :],
                    hin.at[pl.ds(j * CHUNK, CHUNK), :],
                    sems.at[3 + j],
                )
                for j, src in enumerate((hM_hbm, hX_hbm, hY_hbm, hC_hbm))
            ]

        def hout_dma(ci):
            return [
                pltpu.make_async_copy(
                    hout.at[pl.ds(j * CHUNK, CHUNK), :],
                    dst.at[pl.ds(ci * CHUNK, CHUNK), :],
                    sems.at[7 + j],
                )
                for j, dst in enumerate((hM_hbm, hX_hbm, hY_hbm, hC_hbm))
            ]

        stream_dma(0, c0).start()
        for cpy in hin_dma(c0):
            cpy.start()
        for cpy in hin_dma(c0):
            cpy.wait()
        # Frame snap: reader adopts the incoming frame at its first live
        # diagonal (in-chunk row (k*w) % CHUNK of the count halo).
        snap = hin[pl.ds(3 * CHUNK + (k * w) % CHUNK, 1), :]
        cnt = jnp.where(is0, 0.0, snap)
        # Accumulator frame: snap while empty (the pre-owner strips'
        # rescale history is irrelevant until something accumulates).
        asum0 = jnp.max(acc, axis=0, keepdims=True)
        acc_cnt = jnp.where(asum0 > 0.0, acc_cnt, cnt)
        da = jnp.clip(cnt - acc_cnt, 0.0, 3.0)
        half = jnp.exp2(-40.0 * da)
        cmul = jnp.where(da < 3.0, half * half, 0.0)

        st0 = (z, z + y0row, z, z, z, z, z, z, acc, z, cmul, cnt,
               acc_cnt)

        def chunk_body(cc, st):
            ci = c0 + cc
            slot = jax.lax.rem(cc, 2)
            nslot = jax.lax.rem(cc + 1, 2)

            @pl.when(cc + 1 < sweep_chunks)
            def _():
                stream_dma(nslot, ci + 1).start()

            stream_dma(slot, ci).wait()
            # halo-in for THIS chunk was prefetched by the previous
            # iteration (or the strip prologue for cc=0)

            def block(sb, st):
                (M1, Y1, M1s, X1s, Y1s, M2s, X2s, Y2s, acc, accb, cmul,
                 cnt, acc_cnt) = st
                # injected neighbor rows for this block, converted to
                # the reader's frame (see module docstring)
                hMb = hin[pl.ds(0 * CHUNK + sb * unroll, unroll), :]
                hXb = hin[pl.ds(1 * CHUNK + sb * unroll, unroll), :]
                hYb = hin[pl.ds(2 * CHUNK + sb * unroll, unroll), :]
                hCb = hin[pl.ds(3 * CHUNK + sb * unroll, unroll), :]
                # Frame conversion 2**(80*(cnt_r - cnt_w)), applied as
                # two 2**(40*d) multiplies so every stage stays in fp32
                # range. The clip is ASYMMETRIC: the writer can be
                # legitimately DEEPER by several rescales (its local
                # window decays while the reader's match diagonal keeps
                # its peak high), so negative deltas convert down to
                # -3 (2**-240 total; anything deeper underflows to an
                # exact, truly-negligible 0). The reader cannot be more
                # than ~1 rescale deeper than live neighbor values: its
                # masked peak includes its own boundary row, which
                # tracks the injected values — so +1 caps the up-convert
                # and a pathological larger gap errs small, never inf.
                delta = cnt - hCb  # (unroll, 128) broadcast
                g = jnp.exp2(40.0 * jnp.clip(delta, -3.0, 1.0))
                g = jnp.where(is0, 0.0, g)
                hMb = (hMb * g) * g
                hXb = (hXb * g) * g
                hYb = (hYb * g) * g
                for tt in range(unroll):
                    d = ci * CHUNK + sb * unroll + tt
                    off = CHUNK - sb * unroll - tt
                    syw = slab[pl.ds(slot * span + off, w), :]
                    match = (rchar == syw) | (syw == _N_CODE)
                    p = jnp.where(match, pm, qr)
                    Mn = p * (mmv * M2s + gapm * (X2s + Y2s))
                    Xn = M1s * qi + X1s * qg
                    Yn = M1 * qd + Y1 * qg  # row-0 const via qg[0]=1
                    lmask = rlmask & (jnp.asarray(d, jnp.int32) <= rlhl)
                    accb = accb + jnp.where(lmask, Mn + Xn, 0.0)
                    ro = sb * unroll + tt
                    hout[pl.ds(0 * CHUNK + ro, 1), :] = Mn[w - 1 : w, :]
                    hout[pl.ds(1 * CHUNK + ro, 1), :] = Xn[w - 1 : w, :]
                    hout[pl.ds(2 * CHUNK + ro, 1), :] = Yn[w - 1 : w, :]
                    M1sn = jnp.where(row0, hMb[tt : tt + 1, :], roll1(Mn))
                    X1sn = jnp.where(row0, hXb[tt : tt + 1, :], roll1(Xn))
                    Y1sn = jnp.where(row0, hYb[tt : tt + 1, :], roll1(Yn))
                    M1, Y1 = Mn, Yn
                    M1s, X1s, Y1s, M2s, X2s, Y2s = (
                        M1sn, X1sn, Y1sn, M1s, X1s, Y1s)
                # cnt is constant within the block: one store covers it
                hout[pl.ds(3 * CHUNK + sb * unroll, unroll), :] = (
                    jnp.broadcast_to(cnt, (unroll, LANES)))

                # --- per-block exponent rescale (mirrors
                # wavefront.phmm_rescale with global row indices and the
                # count side-channel; same masked-peak math) ---
                acc = acc + accb * cmul
                accb = accb - accb  # fresh zeros, concrete layout
                d = ci * CHUNK + (sb + 1) * unroll - 1
                jv = d - ii
                v0 = (ii <= rl) & (jv >= 0) & (jv <= hl)
                jv1 = (d - 1) - (ii - 1)
                v1 = (ii >= 1) & (ii - 1 <= rl) & (jv1 >= 0) & (jv1 <= hl)
                jv2 = (d - 2) - (ii - 1)
                v2 = (ii >= 1) & (ii - 1 <= rl) & (jv2 >= 0) & (jv2 <= hl)
                live = jnp.where(v0, jnp.maximum(Mn, Yn), z)
                live = jnp.maximum(live, jnp.where(
                    v1, jnp.maximum(jnp.maximum(M1s, X1s), Y1s), z))
                live = jnp.maximum(live, jnp.where(
                    v2, jnp.maximum(jnp.maximum(M2s, X2s), Y2s), z))
                peak = jnp.max(live, axis=0, keepdims=True)
                alive = jnp.asarray(d, jnp.int32) <= rlhl + 1
                # A reader may never run DEEPER than its writer's frame
                # (strip 0, the global reference, rescales freely). This
                # makes delta <= 0 at every inject, so up-conversion —
                # which would overflow when tall mass arrives laterally
                # into a strip whose own window had decayed (measured:
                # the reader rescaled on ~10^-400 junk mass, then the
                # arriving match values hit the overflow cap) — never
                # happens. Mass flushed while gated is >= 86 orders
                # below the lateral inflow from the writer at the same
                # frame, i.e. below fp32 summation noise.
                hc_last = hCb[unroll - 1 : unroll, :]
                lead_ok = is0 | (cnt < hc_last)
                need = (alive & (peak > 0.0)
                        & (peak < PHMM_RESCALE_TRIGGER) & lead_ok)
                f = jnp.where(need, PHMM_RESCALE_FACTOR, 1.0)
                asum = jnp.max(acc, axis=0, keepdims=True)
                follow = need & (asum < PHMM_RESCALE_TRIGGER)
                # Cap at 2**126 (< FLT_MAX, > the 2**120 in-window design
                # ceiling): a strip's masked peak collapses once the
                # alignment leaves its local window while OUT-of-window
                # cells (j > hap_len, continuously re-seeded from the
                # row-0 Y constant cascade) still hold ~2**107+ values;
                # repeated rescales would push those to inf, whose 0*inf
                # products at pad rows poison everything downstream as
                # NaN. Cells beyond the hap end can never re-enter the
                # live window (j only grows) — in their own strip, via
                # the halo, or in the accumulator (lmask bounds j) — so
                # capping them is exact for every reported value.
                cap = 2.0**126

                def rs(v):
                    return jnp.minimum(v * f, cap)

                return (
                    rs(M1), rs(Y1), rs(M1s), rs(X1s), rs(Y1s),
                    rs(M2s), rs(X2s), rs(Y2s),
                    acc * jnp.where(follow, PHMM_RESCALE_FACTOR, 1.0),
                    accb,
                    cmul * jnp.where(need & ~follow,
                                     1.0 / PHMM_RESCALE_FACTOR, 1.0),
                    cnt + jnp.where(need, 1.0, 0.0),
                    acc_cnt + jnp.where(follow, 1.0, 0.0),
                )

            st = jax.lax.fori_loop(0, n_sub, block, st)

            for cpy in hout_dma(ci):
                cpy.start()
            for cpy in hout_dma(ci):
                cpy.wait()

            @pl.when(cc + 1 < sweep_chunks)
            def _():
                for cpy in hin_dma(ci + 1):
                    cpy.start()
                for cpy in hin_dma(ci + 1):
                    cpy.wait()

            return st

        st = jax.lax.fori_loop(0, sweep_chunks, chunk_body, st0)
        return (st[8], st[12])

    acc, acc_cnt = jax.lax.fori_loop(
        0, k_strips, strip_body, (z, zrow))
    total = jnp.sum(acc, axis=0, keepdims=True)
    res = (jnp.log10(total) - acc_cnt * PHMM_RESCALE_LOG10
           - PHMM_INIT_LOG10)
    out_ref[:] = jnp.broadcast_to(res, out_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("k_strips", "strip_w", "ny_max", "unroll", "interpret",
                     "mm_div"),
)
def pairhmm_forward_pallas_long(
    rchar: jax.Array,  # (K*W, 128) int8/int32
    qual: jax.Array,  # (6*K*W, 128) f32: six stacked (K*W, 128)
    # blocks in order qr, mmv, gapm, qi, qd, qg (2-D so per-strip
    # slices are plain row-range DMAs)
    hap: jax.Array,  # (NDt, 128) int8/int32 reversed stream
    meta: jax.Array,  # (8, 128) int32: row0 rl, row1 hl
    *,
    k_strips: int,
    strip_w: int,
    ny_max: int,
    unroll: int = 16,
    interpret: bool = False,
    mm_div: float = 1.0,
) -> jax.Array:
    """Returns (128,) f32 log10 likelihoods for one tile of long jobs."""
    if CHUNK % unroll or unroll > 32:
        raise ValueError(f"unroll must divide {CHUNK} and be <= 32")
    rchar = rchar.astype(jnp.int32)
    hap = hap.astype(jnp.int32)
    w = strip_w
    sweep_chunks, anchor, ndt = _layout(ny_max, w)
    assert hap.shape[0] == ndt, (hap.shape, ndt)
    nhalo = -(-((k_strips - 1) * w + (sweep_chunks + 1) * CHUNK) // CHUNK) * CHUNK

    f = pl.pallas_call(
        functools.partial(
            _kernel, k_strips=k_strips, w=w, anchor=anchor,
            sweep_chunks=sweep_chunks, unroll=unroll, interpret=interpret,
            mm_div=mm_div,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # rchar
                pl.BlockSpec(memory_space=pl.ANY),  # qual
                pl.BlockSpec(memory_space=pl.ANY),  # hap
                pl.BlockSpec((8, LANES), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # hM0
                pl.BlockSpec(memory_space=pl.ANY),  # hX0
                pl.BlockSpec(memory_space=pl.ANY),  # hY0
                pl.BlockSpec(memory_space=pl.ANY),  # hC0
            ],
            out_specs=[
                pl.BlockSpec((8, LANES), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((w, LANES), jnp.float32),  # zeros template
                pltpu.VMEM((w, LANES), jnp.int32),  # strip read codes
                pltpu.VMEM((6 * w, LANES), jnp.float32),  # strip quals
                pltpu.VMEM((2 * (w + CHUNK), LANES), jnp.int32),  # stream
                pltpu.VMEM((4 * CHUNK, LANES), jnp.float32),  # halo in
                pltpu.VMEM((4 * CHUNK, LANES), jnp.float32),  # halo out
                pltpu.SemaphoreType.DMA((11,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nhalo, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        interpret=interpret,
    )
    zh = jnp.zeros((nhalo, LANES), jnp.float32)
    out, _, _, _, _ = f(rchar, qual, hap, meta, zh, zh, zh, zh)
    return out[0]


def pairhmm_long(jobs, phred_offset: float = 33.0, strip_w: int = STRIP_W,
                 unroll: int = 16, interpret: bool = False,
                 mm_div: float = 1.0) -> np.ndarray:
    """log10 likelihoods for arbitrarily long (read, hap) jobs
    (tiles of 128 per call)."""
    out = np.zeros(len(jobs), np.float32)
    for base in range(0, len(jobs), LANES):
        tile = jobs[base : base + LANES]
        arrays, statics = pack_pairhmm_long(tile, phred_offset, strip_w)
        got = np.asarray(
            pairhmm_forward_pallas_long(
                jnp.asarray(arrays["rchar"]),
                jnp.asarray(arrays["qual"]),
                jnp.asarray(arrays["hap"]),
                jnp.asarray(arrays["meta"]),
                unroll=unroll,
                interpret=interpret,
                mm_div=mm_div,
                **statics,
            )
        )
        out[base : base + len(tile)] = got[: len(tile)]
    return out
