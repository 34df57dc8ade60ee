"""Anti-diagonal wavefront step math, shared by the Pallas TPU kernels and
the pure-JAX (lax) backend.

TPU-first formulation (this is NOT how the reference lays it out — the
reference strides one CUDA thread window along each diagonal with
__syncthreads barriers, smithWaterman.cu:283-344 / pairHMM.cu:274-343):

  * One anti-diagonal of one DP matrix lives along the VPU **lane** axis;
    a tile of independent pairs lives along the **sublane** axis. All
    state is (B, lanes) arrays — the rotating 3-diagonal window of the
    reference (antidiagonalSmithWaterman.c:96-184) becomes loop carries.
  * Neighbor access along the diagonal is a lane roll (shift-by-one).
    Shifted copies of the previous diagonal are carried forward so each
    step rolls only the values it just produced (3 rolls/step for SW,
    4 for PairHMM).
  * The streamed second sequence enters as a *reversed diagonal stream*:
    rotating the packed (B, ND) buffer right by one lane per step lands
    the code needed by lane k at diagonal d — a pure circular rotation,
    no inserts, no dynamic indexing (see pack/bucketing.py).
  * The running result (SW max / PairHMM last-row likelihood sum) is
    accumulated into a lane *vector*; the cross-lane reduction happens
    once at the end. Zero per-step cross-lane reductions.
  * Loop-invariant masks/constants are hoisted into a per-sweep "consts"
    bundle computed once.

SW int semantics: the reference's -infinity is INT_MIN with a saturating
add (antidiagonalSmithWaterman.c:38,86-88). Here -infinity is a *finite*
soft sentinel with plain adds — provably score-identical: D >= 0 at every
cell (the max-with-0), so the D-derived candidate in the P/Q maxes is
>= gap_open+gap_extend, while any sentinel-derived chain stays below
sentinel+len and can never win a max or wrap. This removes two compare+
select pairs per step and admits an int16 kernel (sentinel -2**14) for a
2x VPU throughput win whenever sequences are short enough that
|score| + |sentinel| + len < 32768.

SW padding codes: packed sx pads with code 1 and the sy stream with code
2 (never equal, never equal to real bases or '\n'), so out-of-range lanes
always mismatch, their D decays to 0, and the running max needs NO
per-pair length masking at all.

PairHMM numerics: TPU has no fp64. The reference keeps magnitudes afloat
with a DBL_MAX/16 initial constant (pairHMMmatrix.c:43-46). Here the
initial constant is 2**120 in fp32 and a per-pair exponent shift is
tracked: when the in-window diagonal max (across BOTH live diagonals —
the older one bounds the overflow headroom) decays below 2**40, all
value carries are multiplied by 2**80 and the final log10 result is
shifted back. The likelihood accumulator carries its own exponent (see
phmm_step). This supports >70 decimal orders of within-diagonal dynamic
range and unbounded total range; the engine routes anything deeper to
the native fp64 golden model (GKL-style fallback).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from genomax.config import SWConfig

# PairHMM fp32 scaling scheme.
PHMM_INIT_LOG2 = 120  # initial constant = 2**120
PHMM_RESCALE_TRIGGER = 2.0**40
PHMM_RESCALE_FACTOR = 2.0**80
PHMM_RESCALE_LOG10 = 80 * 0.30102999566398120  # log10(2**80)
PHMM_INIT_LOG10 = 120 * 0.30102999566398120
_N_CODE = ord("N")

# Soft -infinity sentinels (see module docstring for the equivalence
# argument). int16 kernels require len(sy) <= SW_I16_MAX_LEN.
NEG_SOFT_I32 = -(2**30)
NEG_SOFT_I16 = -(2**14)
SW_I16_MAX_LEN = 8000


def wavefront_sweep(nd, state, step_fn, unroll: int, block_fn=None):
    """Run the wavefront: ceil(nd/unroll) outer iterations, each tracing
    ``unroll`` python-unrolled steps (static inner trip count → no
    per-diagonal loop overhead on the TPU scalar core, and 100x faster
    Mosaic compiles than a dynamic-bound single-step loop). ``block_fn``
    (the PairHMM rescale) runs once per block, keeping lax.cond out of
    the hot path entirely.

    May run up to unroll-1 diagonals past ``nd``; that is harmless by the
    masking invariants (cells past a pair's last diagonal never pass the
    result masks, and garbage lanes never feed valid cells)."""

    def outer(c, st):
        base = c * unroll
        for t in range(unroll):
            st = step_fn(base + t, st)
        if block_fn is not None:
            st = block_fn(st, base + unroll - 1)
        return st

    n_blocks = (nd + unroll - 1) // unroll
    return jax.lax.fori_loop(0, n_blocks, outer, state)


# ---------------------------------------------------------------------------
# Smith-Waterman
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SWConsts:
    """Loop-invariant values, computed once per sweep."""

    sxb: Any  # (B, NX) lane-fixed codes (lane j = sx[j-1])
    col0: Any  # (B, NX) bool: lane 0 (the j==0 boundary column)
    jj: Any  # (B, NX) lane iota, same dtype as the DP values
    subm: Any  # (B, NX) match-score vector (concrete layout: a select
    subx: Any  # with two scalar splat branches trips Mosaic relayout)
    neg: int  # soft -inf sentinel for this dtype
    roll1: Callable
    cfg: SWConfig


def sw_make_consts(sxb, roll1, cfg: SWConfig) -> SWConsts:
    b, nxp = sxb.shape
    dt = sxb.dtype
    # 16-bit iota isn't supported by the hardware; widen-then-narrow.
    jj = jax.lax.broadcasted_iota(jnp.int32, (b, nxp), 1).astype(dt)
    neg = NEG_SOFT_I16 if dt == jnp.int16 else NEG_SOFT_I32
    zero = sxb - sxb
    return SWConsts(
        sxb=sxb, col0=jj == 0, jj=jj, subm=zero + cfg.match,
        subx=zero + cfg.mismatch, neg=neg, roll1=roll1, cfg=cfg,
    )


def sw_make_state(sy_rev, z):
    """Initial (P1, D1, D1s, Q1s, D2s, syb, mx) carries — syb is the
    full-width (B, ND) rotating reversed stream; D1s/Q1s/D2s are the
    carried roll-by-one copies of the previous diagonals.

    ``z``: a (B, NX) zero template of the DP dtype. Inside Pallas kernels
    this must be zeros round-tripped through a VMEM scratch buffer:
    Mosaic folds constant zeros (even ``x * 0``) into splats with a
    replicated vector layout, which cannot be reconciled with the loop
    body's computed layout ("Invalid relayout" compile errors); a memory
    load always has the standard layout."""
    return (z, z, z, z, z, sy_rev, z)


def sw_step(d, state, c: SWConsts):
    """Compute anti-diagonal d of P/Q/D from diagonals d-1 and d-2
    (recurrences at antidiagonalSmithWaterman.c:309-335, boundaries
    :290-306 — the j==0 column is applied first so the i==0 row wins at
    (0,0), matching the reference's check order).

    Rotation invariant: after this step's rotation, syb lane j holds
    sy[d-1-j] — the sy code cell (i=d-j, j) compares against.
    """
    P1, D1, D1s, Q1s, D2s, syb, mx = state
    cfg = c.cfg
    og_e = cfg.gap_open + cfg.gap_extend

    syb = c.roll1(syb)
    syw = syb[:, : c.sxb.shape[1]]

    # P/Q/D recurrences with plain adds (soft sentinel; see module doc).
    Pn = jnp.maximum(D1 + og_e, P1 + cfg.gap_extend)
    Qn = jnp.maximum(D1s + og_e, Q1s + cfg.gap_extend)
    sub = jnp.where(syw == c.sxb, c.subm, c.subx)
    Dn = jnp.maximum(jnp.maximum(Pn, Qn), jnp.maximum(D2s + sub, 0))

    # Boundaries: column j==0, then row i==0 (lane j == d).
    Pn = jnp.where(c.col0, 0, Pn)
    Qn = jnp.where(c.col0, c.neg, Qn)
    Dn = jnp.where(c.col0, 0, Dn)
    row0 = c.jj == jnp.asarray(d).astype(c.jj.dtype)
    Pn = jnp.where(row0, c.neg, Pn)
    Qn = jnp.where(row0, 0, Qn)
    Dn = jnp.where(row0, 0, Dn)

    # Unmasked running max: pad codes guarantee out-of-range cells decay
    # to 0 and D >= 0 everywhere (antidiagonalSmithWaterman.c:335).
    mx = jnp.maximum(mx, Dn)

    return (Pn, Dn, c.roll1(Dn), c.roll1(Qn), D1s, syb, mx)


def sw_forward_dense(
    sx, sy_rev, nx, ny, n_diags, cfg: SWConfig = SWConfig(), unroll: int = 8
):
    """Pure-JAX batched SW over densely packed pairs (the 'lax' backend and
    the differential twin of the Pallas kernel).

    sx: (B, NX) int16/int32 lane-fixed codes; sy_rev: (B, ND) reversed
    diagonal stream (same dtype); nx, ny: (B,) int32 true dims (len+1,
    unused — kept for API parity with bucketing metadata); n_diags: loop
    bound. Returns (B,) int32 scores.
    """
    del nx, ny  # lengths are encoded via pad codes; see module docstring
    b, nxp = sx.shape
    roll1 = functools.partial(jnp.roll, shift=1, axis=1)
    c = sw_make_consts(sx, roll1, cfg)

    def body(d, state):
        return sw_step(d, state, c)

    z = jnp.zeros((b, nxp), sx.dtype)
    state = wavefront_sweep(n_diags, sw_make_state(sy_rev, z), body, unroll)
    return jnp.max(state[6].astype(jnp.int32), axis=1)


# ---------------------------------------------------------------------------
# PairHMM forward
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PhmmConsts:
    """Loop-invariant values, computed once per sweep."""

    rchar: Any  # (B, NX) lane-fixed read codes (lane i = R[i-1])
    pm: Any  # (B, NX) 1 - Qr  (match emission)
    qr: Any  # (B, NX) Qr      (mismatch emission)
    mmv: Any  # (B, NX) 1 - (Qi + Qd)
    gapm: Any  # (B, NX) 1 - Qg
    qi: Any
    qd: Any
    qg: Any
    rn: Any  # (B, NX) bool: read base is 'N'
    row0: Any  # (B, NX) bool: lane 0
    rlmask: Any  # (B, NX) bool: lane == read_len (the result row)
    y0: Any  # (B, 1) f32: 2**120 / hap_len
    rl: Any  # (B, 1) int32
    hl: Any  # (B, 1) int32
    ii: Any  # (B, NX) int32 lane iota
    roll1: Callable


def phmm_make_consts(rchar, qr, mmv, gapm, qi, qd, qg, rl, hl, roll1) -> PhmmConsts:
    b, nxp = qr.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, nxp), 1)
    return PhmmConsts(
        rchar=rchar,
        pm=1.0 - qr,
        qr=qr,
        mmv=mmv,
        gapm=gapm,
        qi=qi,
        qd=qd,
        qg=qg,
        rn=rchar == _N_CODE,
        row0=ii == 0,
        rlmask=ii == rl,
        y0=(2.0**PHMM_INIT_LOG2) / jnp.maximum(hl, 1).astype(jnp.float32),
        rl=rl,
        hl=hl,
        ii=ii,
        roll1=roll1,
    )


def phmm_make_state(hap_rev, z):
    """(M1, Y1, M1s, X1s, Y1s, M2s, X2s, Y2s, hb, acc, cmul, acc_log).

    M1/Y1 are the previous diagonal unshifted; *1s are its roll-by-one
    copies; *2s are the roll-by-one copies of the diagonal before it
    (carried forward — each step only rolls what it just computed).
    hap_rev: (B, ND) reversed haplotype stream; z: (B, NX) f32 zero
    template (see sw_make_state layout note).
    """
    zc = z[:, 0:1]
    return (z, z, z, z, z, z, z, z, hap_rev, z, zc + 1.0, zc)


def phmm_step(d, state, c: PhmmConsts):
    """Compute anti-diagonal d of M/X/Y (pairHMMmatrix.c:49-55).

    Lane axis = read index i; all per-base arrays are lane-fixed (lane i
    holds quality index i-1). hb rotation invariant: after this step's
    roll, hb lane i holds H[d-1-i] = H[j-1] for the cell (i, j=d-i).

    Scaling invariants: the M/X/Y diagonals carry a shared per-pair scale
    (rescale events push it up by 2**80, phmm_rescale); the likelihood
    accumulator ``acc`` carries its OWN scale (``acc_log``, log10) with
    contributions folded in through ``cmul`` = 2**(-80 * (buffer_rescales
    - acc_rescales)). The accumulator follows the buffer scale while it
    is small, then freezes; frozen-scale contributions that underflow
    cmul are provably below fp32 summation noise. The row-0 constant
    never rescales: a rescale can only fire once rows 0/1 have left the
    valid window (lane-0 Y is pinned at 2**120/hl >= 2**106, far above
    the 2**40 trigger), and valid cells only consume in-window values.
    """
    M1, Y1, M1s, X1s, Y1s, M2s, X2s, Y2s, hb, acc, cmul, acc_log = state

    hb = c.roll1(hb)
    hw = hb[:, : c.rchar.shape[1]]

    # emission p() (pairHMMmatrix.c:32-34)
    match = (c.rchar == hw) | c.rn | (hw == _N_CODE)
    p = jnp.where(match, c.pm, c.qr)

    Mn = p * (c.mmv * M2s + c.gapm * (X2s + Y2s))
    Xn = M1s * c.qi + X1s * c.qg
    Yn = M1 * c.qd + Y1 * c.qg

    # boundaries: col j==0 (lane i==d) zeros; row i==0 (lane 0) Y=y0
    col0 = c.ii == d
    Mn = jnp.where(col0, 0.0, Mn)
    Xn = jnp.where(col0, 0.0, Xn)
    Yn = jnp.where(col0, 0.0, Yn)
    Mn = jnp.where(c.row0, 0.0, Mn)
    Xn = jnp.where(c.row0, 0.0, Xn)
    Yn = jnp.where(c.row0, c.y0, Yn)

    # Last-row likelihood accumulation (antidiagsPairHMM.c:206-212): the
    # cell (read_len, j) lands at lane rl exactly once per diagonal, in
    # increasing-j order — the reference's summation order. Cells with
    # j > hap_len are masked out; j <= 0 contributes exact zeros (col-0
    # boundary / untouched lanes), so no lower-bound check is needed.
    lmask = c.rlmask & (c.ii >= d - c.hl)
    acc = acc + jnp.where(lmask, (Mn + Xn) * cmul, 0.0)

    return (
        Mn,
        Yn,
        c.roll1(Mn),
        c.roll1(Xn),
        c.roll1(Yn),
        M1s,
        X1s,
        Y1s,
        hb,
        acc,
        cmul,
        acc_log,
    )


def phmm_rescale(state, d, c: PhmmConsts):
    """Per-pair exponent rescale, applied once per unrolled block.

    The peak is taken over BOTH live diagonals (current values M1/Y1 and
    X1s with a shifted window mask, plus the older *2s copies): the older
    diagonal can exceed the newer one by the per-diagonal decay, and it
    is multiplied by the same factor, so it must bound the overflow
    headroom (trigger 2**40 * factor 2**80 <= 2**120 << FLT_MAX).
    Unconditional in dataflow terms: rows not rescaling multiply by 1.0.
    """
    M1, Y1, M1s, X1s, Y1s, M2s, X2s, Y2s, hb, acc, cmul, acc_log = state
    ii, rl, hl = c.ii, c.rl, c.hl
    jv = d - ii
    # window of the current diagonal d (cells (i, d-i))
    v0 = (ii <= rl) & (jv >= 0) & (jv <= hl)
    # window of shifted copies: lane i holds cell (i-1, *) of diag d-1
    jv1 = (d - 1) - (ii - 1)
    v1 = (ii >= 1) & (ii - 1 <= rl) & (jv1 >= 0) & (jv1 <= hl)
    # window of shifted copies of diag d-2
    jv2 = (d - 2) - (ii - 1)
    v2 = (ii >= 1) & (ii - 1 <= rl) & (jv2 >= 0) & (jv2 <= hl)

    zero = jnp.zeros_like(M1)
    live = jnp.where(v0, jnp.maximum(M1, Y1), zero)
    live = jnp.maximum(
        live, jnp.where(v1, jnp.maximum(jnp.maximum(M1s, X1s), Y1s), zero)
    )
    live = jnp.maximum(
        live, jnp.where(v2, jnp.maximum(jnp.maximum(M2s, X2s), Y2s), zero)
    )
    peak = jnp.max(live, axis=1, keepdims=True)
    need = (peak > 0.0) & (peak < PHMM_RESCALE_TRIGGER)
    f = jnp.where(need, PHMM_RESCALE_FACTOR, 1.0)
    # The accumulator follows the buffer scale only while small.
    asum = jnp.max(acc, axis=1, keepdims=True)
    follow = need & (asum < PHMM_RESCALE_TRIGGER)
    return (
        M1 * f,
        Y1 * f,
        M1s * f,
        X1s * f,
        Y1s * f,
        M2s * f,
        X2s * f,
        Y2s * f,
        hb,
        acc * jnp.where(follow, PHMM_RESCALE_FACTOR, 1.0),
        cmul * jnp.where(need & ~follow, 1.0 / PHMM_RESCALE_FACTOR, 1.0),
        acc_log - jnp.where(follow, PHMM_RESCALE_LOG10, 0.0),
    )


def phmm_finalize(state):
    """log10(sum of last-row M+X) minus the scaling constant
    (pairHMMmatrix.c:59-66), exponent shifts folded back in."""
    acc, acc_log = state[9], state[11]
    total = jnp.sum(acc, axis=1, keepdims=True)
    return (jnp.log10(total) + acc_log - PHMM_INIT_LOG10)[:, 0]


def phmm_forward_dense(
    rchar,
    qr,
    mmv,
    gapm,
    qi,
    qd,
    qg,
    hap_rev,
    rl,
    hl,
    n_diags,
    rescale_period: int = 8,
):
    """Pure-JAX batched PairHMM forward (the 'lax' backend).

    rchar: (B, NX) int codes; the 6 quality arrays: (B, NX) f32
    lane-fixed (lane i = base i-1). hap_rev: (B, ND) int reversed
    diagonal stream. rl, hl: (B,) true lengths. Returns (B,) f32 log10
    likelihoods relative to the reference constant.
    """
    b, nxp = qr.shape
    roll1 = functools.partial(jnp.roll, shift=1, axis=1)
    c = phmm_make_consts(
        rchar, qr, mmv, gapm, qi, qd, qg, rl.reshape(b, 1), hl.reshape(b, 1), roll1
    )

    def body(d, state):
        return phmm_step(d, state, c)

    def block(state, d):
        return phmm_rescale(state, d, c)

    z = jnp.zeros((b, nxp), jnp.float32)
    state = wavefront_sweep(
        n_diags, phmm_make_state(hap_rev, z), body, unroll=rescale_period,
        block_fn=block,
    )
    return phmm_finalize(state)
