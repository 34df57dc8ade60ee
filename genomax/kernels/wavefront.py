"""Anti-diagonal wavefront step math, shared by the Pallas TPU kernels and
the pure-JAX (lax) backend.

TPU-first formulation (this is NOT how the reference lays it out — the
reference strides one CUDA thread window along each diagonal with
__syncthreads barriers, smithWaterman.cu:283-344 / pairHMM.cu:274-343):

  * One anti-diagonal of one DP matrix lives along the VPU **lane** axis;
    a tile of independent pairs lives along the **sublane** axis. All
    state is (B, lanes) arrays — the rotating 3-diagonal window of the
    reference (antidiagonalSmithWaterman.c:96-184) becomes loop carries.
  * Neighbor access along the diagonal is a lane roll (shift-by-one), not
    an indexed memory access. Boundary rows/cols are lane-masked selects.
  * The streamed second sequence enters as a *reversed diagonal stream*:
    the packed (B, ND) buffer holds the codes such that rotating it right
    by one lane per wavefront step aligns code needed by lane k at
    diagonal d (a pure circular rotation — no per-step element inserts,
    no dynamic indexing; see pack/bucketing.py).
  * The running result (SW max / PairHMM last-row likelihood sum) is
    accumulated into a lane *vector*; the cross-lane reduction happens
    once at the end. Zero per-step cross-lane reductions.

Axis orientation:
  * SW: lanes = x (the shorter sequence, columns). sx is lane-fixed; the
    longer sequence sy is the rotating stream.
  * PairHMM: lanes = i (the read). All per-base quality arrays are
    lane-fixed; the haplotype chars are the rotating stream.

PairHMM numerics: TPU has no fp64. The reference keeps magnitudes afloat
with a DBL_MAX/16 initial constant (pairHMMmatrix.c:43-46). Here the
initial constant is 2**120 in fp32 and a per-pair exponent shift is
tracked: whenever the masked diagonal max decays below 2**40, the live
M/X/Y diagonals are multiplied by 2**80 and the final log10 result is
shifted back (the likelihood accumulator carries its own exponent — see
phmm_step). This keeps >70 decimal orders of within-diagonal dynamic
range and unbounded total range.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from genomax.config import NEG_INF_I32, SWConfig

# PairHMM fp32 scaling scheme.
PHMM_INIT_LOG2 = 120  # initial constant = 2**120
PHMM_RESCALE_TRIGGER = 2.0**40
PHMM_RESCALE_FACTOR = 2.0**80
PHMM_RESCALE_LOG10 = 80 * 0.30102999566398120  # log10(2**80)
PHMM_INIT_LOG10 = 120 * 0.30102999566398120
_N_CODE = ord("N")


def _sat_add(v, c: int):
    """sum_with_infinity: INT_MIN-absorbing add
    (antidiagonalSmithWaterman.c:86-88)."""
    return jnp.where(v == NEG_INF_I32, NEG_INF_I32, v + c)


def wavefront_sweep(nd, state, step_fn, unroll: int, block_fn=None):
    """Run the wavefront: ceil(nd/unroll) outer iterations, each tracing
    ``unroll`` python-unrolled steps (static inner trip count → no
    per-diagonal loop overhead on the TPU scalar core). ``block_fn``
    (e.g. the PairHMM rescale) runs once per block, keeping lax.cond out
    of the hot path entirely.

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


def sw_make_state(sy_rev, z):
    """Initial (P1, Q1, D1, D2, syb, mx) carries — syb is the full-width
    (B, ND) rotating reversed stream.

    ``z``: a (B, NX) int32 zero template. Inside Pallas kernels this must
    be zeros round-tripped through a VMEM scratch buffer: Mosaic folds
    constant zeros (even ``x * 0``) into splats with a replicated vector
    layout, which cannot be reconciled with the loop body's computed
    layout ("Invalid relayout" compile errors); a memory load always has
    the standard layout."""
    return (z, z, z, z, sy_rev, z)


def sw_step(d, state, *, sxb, nx1, ny1, jj, roll1, cfg: SWConfig):
    """Compute anti-diagonal d of P/Q/D from diagonals d-1 and d-2.

    state  : (P1, Q1, D1, D2, syb, mx); DP carries are (B, NX) int32, syb
             is the (B, ND) rotating reversed stream.
    sxb    : (B, NX) lane-fixed codes, lane j holds sx[j-1].
    nx1/ny1: (B, 1) nx-1 / ny-1 (true lengths).
    jj     : (B, NX) lane iota.
    roll1  : rotate-right-by-one-lane function.

    Rotation invariant: after the rotation below, syb lane j holds
    sy[d-1-j] — exactly the sy code cell (i=d-j, j) compares against
    (sy[i-1]).
    """
    P1, Q1, D1, D2, syb, mx = state
    og_e = cfg.gap_open + cfg.gap_extend

    syb = roll1(syb)
    syw = syb[:, : sxb.shape[1]]
    iv = d - jj  # row index of each lane's cell

    D1s = roll1(D1)
    Q1s = roll1(Q1)
    D2s = roll1(D2)

    # P[i][j] = max(D[i-1][j]+og+e, P[i-1][j]+e)      (.c:309-315)
    Pn = jnp.maximum(_sat_add(D1, og_e), _sat_add(P1, cfg.gap_extend))
    # Q[i][j] = max(D[i][j-1]+og+e, Q[i][j-1]+e)      (.c:317-323)
    Qn = jnp.maximum(_sat_add(D1s, og_e), _sat_add(Q1s, cfg.gap_extend))
    # D[i][j] = max(P, Q, D[i-1][j-1]+/-1, 0)         (.c:325-335)
    sub = jnp.where(syw == sxb, cfg.match, cfg.mismatch)
    Dt = D2s + sub  # valid D cells are never -inf (D >= 0 always)
    Dn = jnp.maximum(jnp.maximum(Pn, Qn), jnp.maximum(Dt, 0))

    # Boundaries. Column j==0 first, then row i==0 — the reference checks
    # iy==0 before ix==0 so the row values win at (0,0) (.c:290-306).
    col0 = jj == 0
    Pn = jnp.where(col0, 0, Pn)
    Qn = jnp.where(col0, NEG_INF_I32, Qn)
    Dn = jnp.where(col0, 0, Dn)
    row0 = iv == 0
    Pn = jnp.where(row0, NEG_INF_I32, Pn)
    Qn = jnp.where(row0, 0, Qn)
    Dn = jnp.where(row0, 0, Dn)

    # Running max over interior cells only (.c:335).
    valid = (jj >= 1) & (jj <= nx1) & (iv >= 1) & (iv <= ny1)
    mx = jnp.where(valid, jnp.maximum(mx, Dn), mx)

    return (Pn, Qn, Dn, D1, syb, mx)


def sw_forward_dense(sx, sy_rev, nx, ny, n_diags: int, cfg: SWConfig = SWConfig()):
    """Pure-JAX batched SW over densely packed pairs (the 'lax' backend and
    the differential twin of the Pallas kernel).

    sx: (B, NX) int32 lane-fixed codes; sy_rev: (B, ND) int32 reversed
    diagonal stream; nx, ny: (B,) int32 true dims (len+1); n_diags:
    static loop bound. Returns (B,) int32 scores.
    """
    b, nxp = sx.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (b, nxp), 1)
    nx1 = (nx - 1).reshape(b, 1)
    ny1 = (ny - 1).reshape(b, 1)
    roll1 = functools.partial(jnp.roll, shift=1, axis=1)

    def body(d, state):
        return sw_step(
            d, state, sxb=sx, nx1=nx1, ny1=ny1, jj=jj, roll1=roll1, cfg=cfg
        )

    z = jnp.zeros((b, nxp), jnp.int32)
    state = wavefront_sweep(n_diags, sw_make_state(sy_rev, z), body, unroll=8)
    return jnp.max(state[5], axis=1)


# ---------------------------------------------------------------------------
# PairHMM forward
# ---------------------------------------------------------------------------


def phmm_make_state(hap_rev, z):
    """(M1, X1, Y1, M2, X2, Y2, hb, acc, cmul, acc_log) carries.

    hap_rev: (B, ND) int32 reversed diagonal stream of haplotype codes;
    z: (B, NX) f32 zero template (see sw_make_state layout note).
    """
    zc = z[:, 0:1]
    return (z, z, z, z, z, z, hap_rev, z, zc + 1.0, zc)


def phmm_step(
    d,
    state,
    *,
    rchar,
    qr,
    mmv,
    gapm,
    qi,
    qd,
    qg,
    rl,
    hl,
    ii,
    roll1,
):
    """Compute anti-diagonal d of M/X/Y (pairHMMmatrix.c:49-55).

    Lane axis = read index i; lane-fixed per-base arrays hold values for
    row i (i.e. quality index i-1): qr=Qr, mmv=1-(Qi+Qd), gapm=1-Qg,
    qi=Qi, qd=Qd, qg=Qg. rl/hl: (B,1) true read/hap lengths. hb is the
    (B, ND) rotating reversed haplotype stream (lane i holds H[d-1-i]
    after this step's rotation).

    Scaling invariants (see module docstring): the M/X/Y diagonals carry a
    shared per-pair scale that rescale events push up by 2**80; the
    likelihood accumulator ``acc`` carries its OWN scale (``acc_log`` in
    log10) and new contributions are folded in through ``cmul`` =
    2**(-80 * (buffer_rescales - acc_rescales)). The accumulator follows
    the buffer scale while it is still small, then freezes; frozen-scale
    contributions that underflow cmul are provably below fp32 summation
    noise. The row-0 constant never rescales: a rescale can only fire
    once rows 0/1 have left the valid window (lane-0 Y is pinned at
    2**120/hl >= 2**106, far above the 2**40 trigger), and valid cells
    only ever consume values computed while in-window.
    """
    M1, X1, Y1, M2, X2, Y2, hb, acc, cmul, acc_log = state

    hb = roll1(hb)
    hw = hb[:, : rchar.shape[1]]
    jv = d - ii  # column (haplotype) index of each lane's cell

    M1s = roll1(M1)
    X1s = roll1(X1)
    M2s = roll1(M2)
    X2s = roll1(X2)
    Y2s = roll1(Y2)

    # emission p() (pairHMMmatrix.c:32-34)
    match = (rchar == hw) | (rchar == _N_CODE) | (hw == _N_CODE)
    p = jnp.where(match, 1.0 - qr, qr)

    Mn = p * (mmv * M2s + gapm * (X2s + Y2s))
    Xn = M1s * qi + X1s * qg
    Yn = M1 * qd + Y1 * qg

    # boundaries: col j==0 (i==d) zeros; row i==0 (lane 0) M=X=0, Y=y0/hl
    col0 = ii == d
    Mn = jnp.where(col0, 0.0, Mn)
    Xn = jnp.where(col0, 0.0, Xn)
    Yn = jnp.where(col0, 0.0, Yn)
    row0 = ii == 0
    y0 = (2.0**PHMM_INIT_LOG2) / jnp.maximum(hl, 1).astype(jnp.float32)
    Mn = jnp.where(row0, 0.0, Mn)
    Xn = jnp.where(row0, 0.0, Xn)
    Yn = jnp.where(row0, y0, Yn)

    # last-row likelihood accumulation (antidiagsPairHMM.c:206-212): the
    # cell (read_len, j) lands at lane rl exactly once per diagonal, in
    # increasing-j order — the same summation order as the reference.
    lmask = (ii == rl) & (jv >= 1) & (jv <= hl)
    acc = acc + jnp.where(lmask, (Mn + Xn) * cmul, 0.0)

    return (Mn, Xn, Yn, M1, X1, Y1, hb, acc, cmul, acc_log)


def phmm_rescale(state, d, *, rl, hl, ii):
    """Per-pair exponent rescale (fp32 range management), applied once per
    rescale period — hoisted out of the per-diagonal step so the hot loop
    carries no lax.cond. ``d`` is the index of the most recent diagonal.

    Unconditional in dataflow terms: rows that don't need rescaling are
    multiplied by 1.0 (no branching on TPU vectors)."""
    M1, X1, Y1, M2, X2, Y2, hb, acc, cmul, acc_log = state
    jv = d - ii
    vmask = (ii <= rl) & (jv >= 0) & (jv <= hl)
    live = jnp.where(vmask, jnp.maximum(jnp.maximum(M1, X1), Y1), 0.0)
    peak = jnp.max(live, axis=1, keepdims=True)
    need = (peak > 0.0) & (peak < PHMM_RESCALE_TRIGGER)
    f = jnp.where(need, PHMM_RESCALE_FACTOR, 1.0)
    # The accumulator follows the buffer scale only while small.
    asum = jnp.max(acc, axis=1, keepdims=True)
    follow = need & (asum < PHMM_RESCALE_TRIGGER)
    return (
        M1 * f,
        X1 * f,
        Y1 * f,
        M2 * f,
        X2 * f,
        Y2 * f,
        hb,
        acc * jnp.where(follow, PHMM_RESCALE_FACTOR, 1.0),
        cmul * jnp.where(need & ~follow, 1.0 / PHMM_RESCALE_FACTOR, 1.0),
        acc_log - jnp.where(follow, PHMM_RESCALE_LOG10, 0.0),
    )


def phmm_finalize(state):
    """log10(sum of last-row M+X) minus the scaling constant
    (pairHMMmatrix.c:59-66), exponent shifts folded back in."""
    acc, acc_log = state[7], state[9]
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
    n_diags: int,
    rescale_period: int = 16,
):
    """Pure-JAX batched PairHMM forward (the 'lax' backend).

    rchar and the 6 quality arrays: (B, NX) lane-fixed (lane i = base i-1).
    hap_rev: (B, ND) int32 reversed diagonal stream. rl, hl: (B,) true
    lengths. Returns (B,) f32 log10 likelihoods relative to the reference
    constant.
    """
    b, nxp = rchar.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, nxp), 1)
    rl2 = rl.reshape(b, 1)
    hl2 = hl.reshape(b, 1)
    roll1 = functools.partial(jnp.roll, shift=1, axis=1)

    def body(d, state):
        return phmm_step(
            d,
            state,
            rchar=rchar,
            qr=qr,
            mmv=mmv,
            gapm=gapm,
            qi=qi,
            qd=qd,
            qg=qg,
            rl=rl2,
            hl=hl2,
            ii=ii,
            roll1=roll1,
        )

    def block(state, d):
        return phmm_rescale(state, d, rl=rl2, hl=hl2, ii=ii)

    z = jnp.zeros((b, nxp), jnp.float32)
    state = wavefront_sweep(
        n_diags, phmm_make_state(hap_rev, z), body, unroll=rescale_period,
        block_fn=block,
    )
    return phmm_finalize(state)
