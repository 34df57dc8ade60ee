"""Pallas TPU kernel: conveyor-packed Smith-Waterman for short pairs.

At short lengths the wavefront kernels are bound by anti-diagonal
triangle waste (a 65bp pair sweeps a 72-row window for ~160 diagonals:
padded/real ~2.7x; strips can't help — nxs=72 leaves no strip room).
The conveyor removes it by CHAINING pairs through the sublane window:
each lane processes a queue of pairs with period T = max(nxs, ny_max);
pair q's cell (column r, row j) computes at global step d = q*T + r + j.

Geometry that makes this cheap (validated in the numpy prototype,
experiments/conveyor_proto2.py, fuzzed vs the full-matrix oracle):

  * The stream stays ONE shared dynamic window: position A0 - m of the
    packed buffer serves coordinate m = d - r for every pair (pair q
    owns m in [qT+1, qT+ny_q], disjoint for ny <= T), so the per-step
    load is buf[A0 - d : A0 - d + nxs) — identical in form to the other
    kernels, with the queue baked into the buffer layout.
  * Exactly ONE row switches pairs per step: r* = (d-1) mod T. At the
    switch, the row's x-code updates from a schedule buffer (row d),
    and the stale unshifted carries reset — Pn and D2s fold the reset
    into their existing maxes (the zero IS the incoming pair's row-0 /
    col-0 boundary value), mx resets after harvesting. The shifted
    carries (D1s/Q1s) already hold the incoming pair's data because
    row r*-1 switched one step earlier.
  * Harvest: killed mx rows collect into a `doneacc` array (all rows
    killed during period block (qT, (q+1)T] belong to pair q-1); at
    each period boundary doneacc reduces across sublanes to the
    finished pair's score. T is a multiple of the unroll so the
    boundary always lands at in-block step tt == 1 — the once-per-
    period work (reduce, store, reset, counters) costs ~1/unroll
    per step.
  * Boundary rows 0 / nxs-1 are pinned by the same -KILL constant
    vectors as the resident kernel (kernels/wavefront.py), so the
    circular roll's wrap is inert for every pair in the queue.

Swept slots per pair: nxs * T (= 72*72 at 64bp, 1.23x real) vs the
resident kernel's nxs * n_diags (2.7x). Extra per-step cost: ~5 vector
ops (switch-row compare, three folded kills, schedule select, harvest
collect) on the 13-op loop.

Semantics source: antidiagonalSmithWaterman.c:82-92,290-335 via
kernels/wavefront.py; the conveyor replaces the reference's
one-block-per-pair batching (smithWaterman.cu:466) with a dense
time-multiplexed queue per lane.
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
from genomax.kernels.wavefront import KILL
from genomax.pack.bucketing import (LANES, PAD_STREAM, PAD_X,
                                    _reject_pad_codes, _round_up)

UNROLL = 8  # block length; T is rounded to it so period boundaries are
# block-aligned (at static in-block step 1)


@dataclasses.dataclass
class SWConveyorPacked:
    """Conveyor-packed SW jobs: tiles of 128 lanes x P queue slots.

    sched: (NT, SR, 128) int8 — row d holds the x code that the
           switching row r* = (d-1) mod T adopts at step d
    sy   : (NT, NB, 128) int8 — stream buffer, position A0 - m holds
           the code for coordinate m (see module docstring)
    perm : original pair index of (tile, slot, lane), slot-major
    """

    sched: np.ndarray
    sy: np.ndarray
    nxs: int
    n_slots: int  # P
    period: int  # T
    a0: int
    perm: np.ndarray
    n_valid: int


def pack_sw_conveyor(pairs, idx=None, max_slots: int = 64) -> SWConveyorPacked:
    """Pack the given pairs (optionally a subset via idx) for the
    conveyor kernel. All pairs must satisfy len(sx)+2 <= nxs bound and
    ny <= T; the caller buckets accordingly."""
    if idx is None:
        idx = np.arange(len(pairs))
    idx = np.asarray(idx)
    n = len(idx)
    nx_max = max(len(pairs[i].sx) for i in idx)
    ny_max = max(len(pairs[i].sy) for i in idx)
    nxs = _round_up(nx_max + 2, 8)
    T = _round_up(max(nxs, ny_max + 1), UNROLL)
    # slots per lane (P): tiles of 128*P pairs; quantize P mildly
    nt = max(1, -(-n // (LANES * max_slots)))
    P = -(-n // (LANES * nt))
    dmax = (P + 1) * T + UNROLL
    SR = dmax + 2 * UNROLL + 8
    A0 = _round_up(dmax + UNROLL, 8)
    NB = A0 + nxs

    # sort by ny so co-tiled queues have similar periods (the bucket's
    # T is shared; sorting keeps padding honest for ragged inputs)
    order = np.argsort([len(pairs[i].sy) for i in idx], kind="stable")
    idx = idx[order]

    sched = np.full((nt, SR, LANES), PAD_X, np.int8)
    sy = np.full((nt, NB, LANES), PAD_STREAM, np.int8)
    for r, gi in enumerate(idx):
        p = pairs[gi]
        t, rem = divmod(r, P * LANES)
        q, lane = divmod(rem, LANES)
        ys = np.frombuffer(p.sy, np.uint8)
        _reject_pad_codes(ys, "sy")
        # buf[A0 - (q*T + j)] = sy[j-1], j = 1..ny
        base = A0 - q * T
        sy[t, base - len(ys) : base, lane] = ys[::-1]
        xs = np.frombuffer(p.sx, np.uint8)
        _reject_pad_codes(xs, "sx")
        # sched[d = q*T + r' + 1] = sx[r'-1] for r' in [1, len(sx)]
        d0 = q * T + 2
        sched[t, d0 : d0 + len(xs), lane] = xs
    return SWConveyorPacked(
        sched=sched, sy=sy, nxs=nxs, n_slots=P, period=T, a0=A0,
        perm=idx, n_valid=n,
    )


def _kernel(sched_ref, sy_ref, out_ref, zscr, *, cfg: SWConfig, nxs: int,
            n_slots: int, period: int, a0: int, interpret: bool):
    T, P = period, n_slots
    ge = cfg.gap_extend
    og_e = cfg.gap_open + cfg.gap_extend
    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    zscr[:] = jnp.zeros((nxs, LANES), jnp.int32)
    z = zscr[:]
    ii = jax.lax.broadcasted_iota(jnp.int32, (nxs, LANES), 0)
    row0 = ii == 0
    rowl = ii == nxs - 1
    subm = jnp.where(rowl, -KILL, z + cfg.match)
    subx = jnp.where(rowl, -KILL, z + cfg.mismatch)
    gev = jnp.where(row0, -KILL, z + ge)
    ogev = jnp.where(rowl, -KILL, z + og_e)

    n_blocks = ((P + 1) * T + UNROLL) // UNROLL

    def block(blk, st):
        P1, D1, D1s, Q1s, D2s, mx, doneacc, sxb = st
        d0 = blk * UNROLL
        # rst0 = (d0 - 1) mod T; isb = this block starts a period
        q0 = d0 // T
        isb = q0 * T == d0
        rst0 = d0 - q0 * T - 1
        rst0 = jnp.where(rst0 < 0, T - 1, rst0)

        # once-per-period work (T % UNROLL == 0 puts the boundary at
        # in-block step 1; see module docstring)
        @pl.when(isb & (q0 >= 2) & (q0 - 2 < P))
        def _():
            score = jnp.max(doneacc.astype(jnp.int32), axis=0,
                            keepdims=True)
            out_ref[pl.ds(q0 - 2, 1), :] = score

        doneacc = jnp.where(isb, z, doneacc)
        # one (UNROLL, 128) schedule load per block, static extracts
        sblk = sched_ref[0, pl.ds(d0, UNROLL), :]

        for tt in range(UNROLL):
            d = d0 + tt
            rstv = rst0 + tt
            rst = jnp.where(rstv >= T, rstv - T, rstv)
            rowmask = ii == rst
            doneacc = jnp.where(rowmask, mx, doneacc)
            sxb = jnp.where(rowmask, sblk[tt : tt + 1, :], sxb)
            syw = sy_ref[0, pl.ds(a0 - d, nxs), :]
            Pn = jnp.where(rowmask, 0, jnp.maximum(D1, P1 + ge))
            Qn = jnp.maximum(D1s, Q1s + gev)
            sub = jnp.where(syw == sxb, subm, subx)
            D2k = jnp.where(rowmask, 0, D2s)
            Dn = jnp.maximum(jnp.maximum(Pn, Qn) + ogev,
                             jnp.maximum(D2k + sub, 0))
            mx = jnp.maximum(jnp.where(rowmask, 0, mx), Dn)
            P1, D1, D1s, Q1s, D2s = Pn, Dn, roll1(Dn), roll1(Qn), D1s
        return (P1, D1, D1s, Q1s, D2s, mx, doneacc, sxb)

    sxb0 = (z + PAD_X)
    st = jax.lax.fori_loop(
        0, n_blocks, block, (z, z, z, z, z, z, z, sxb0))
    del st


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "nxs", "n_slots", "period", "a0", "interpret"),
)
def sw_forward_pallas_conveyor(
    sched: jax.Array,  # (NT, SR, 128) int8/int32
    sy: jax.Array,  # (NT, NB, 128) int8/int32
    *,
    cfg: SWConfig = SWConfig(),
    nxs: int,
    n_slots: int,
    period: int,
    a0: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NT * P8, 128) int32 scores, P8 = round_up(P, 8); row
    q of a tile's block = queue slot q's scores."""
    sched = sched.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    nt = sched.shape[0]
    p8 = _round_up(n_slots, 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, sched.shape[1], LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sy.shape[1], LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p8, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nxs, LANES), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cfg=cfg, nxs=nxs, n_slots=n_slots, period=period,
            a0=a0, interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * p8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sched, sy)
    return out


def unpack_conveyor(b: SWConveyorPacked, res, n_total: int) -> np.ndarray:
    """Scatter kernel output back to original pair order."""
    res = np.asarray(res)
    p8 = _round_up(b.n_slots, 8)
    out = np.zeros(n_total, np.int32)
    r = np.arange(len(b.perm))
    t, rem = np.divmod(r, b.n_slots * LANES)
    q, lane = np.divmod(rem, LANES)
    out[b.perm] = res[t * p8 + q, lane]
    return out


def sw_scores_conveyor(pairs, cfg: SWConfig = SWConfig(), idx=None,
                       max_slots: int = 64,
                       interpret: bool = False) -> np.ndarray:
    """Scores for short SWPair jobs through the conveyor kernel."""
    b = pack_sw_conveyor(pairs, idx, max_slots)
    res = sw_forward_pallas_conveyor(
        jnp.asarray(b.sched), jnp.asarray(b.sy),
        cfg=cfg, nxs=b.nxs, n_slots=b.n_slots, period=b.period, a0=b.a0,
        interpret=interpret,
    )
    return unpack_conveyor(b, res, len(pairs))
