"""Pallas TPU kernel: column-stationary ("rotor") conveyor Smith-Waterman.

The last documented idea against the <=128bp anti-diagonal slot waste
(DESIGN.md SS3c/SS4): the plain conveyor (kernels/sw_conveyor.py) chains
pairs through the sublane window in TIME and pays ~6 per-step vector ops
of switch-row bookkeeping. This variant ROTATES the frame so the switch
machinery becomes layout:

  physical sublane p always computes matrix column c = p + 1.

With period T and pair q's cell (r, c) scheduled at step d = q*T + r + c,
physical row p at step d holds (r, c=p+1) where u = d - p - 1 encodes
BOTH the pair and the row: q = u div T, r = u mod T (r = 0 is the
inter-pair boundary slot). Consequences, each replacing a per-step
select of the plain conveyor with layout or constants:

  * The x-codes become ONE reversed stream shared by all rows:
    row p needs xcodes[u = d - p - 1], i.e. the same dynamic sublane
    window load as every other genomax kernel (xrev[A - d + 1 + p]).
    The plain conveyor's per-step schedule select disappears; there is
    no "switch event" at all - every row advances r by one per step.
  * The y-codes become sublane-STATIONARY (row p holds sy_q[p]),
    refreshed one row per step at the moving wrap row
    p* = (d - 1) mod T via a dynamic single-row VMEM scratch store
    (measured cheap on v5e - CLAUDE.md machine model) fed by one
    single-row load from a period-aligned buffer ybuf[d - 1].
  * The column-T boundary pins live at FIXED physical row T-1, so they
    ride the same -KILL constant vectors as the resident kernel
    (sub/ogev pins force Dn[T-1] = 0 exactly; kT1/gevP force
    Pn[T-1] = -KILL). The sublane roll's wrap row0 <- rowT-1 then
    delivers exactly the left-boundary pair (D(r,0) = 0, P' killed)
    - the circular wrap IS the column boundary.
  * The only remaining moving boundary is the wrap row p* (the r = 0
    slot between consecutive pairs in a lane's queue). Its x-code is
    PAD_X by construction (u = qT), which guarantees the substitution
    mismatch; two wrapmask selects force Dn[p*] = 0 and Qn[p*] = 0 so
    no P/Q/D chain crosses from pair q-1's pad rows into pair q
    (boundary exactness proof in _kernel).

Per-step cost: 18 ALU + 2 sublane rolls + 1 single-row load + 1
single-row store (vs the resident kernel's 12 + 2 and the plain
conveyor's ~18 + 2 with heavier scalar work). Swept slots per pair:
T*T (T = round_up(max(nx, ny) + 1, 8)) = 1.27x real cells at 64bp vs
the resident kernel's 2.24x - the bet is that the slot reclaim beats
the op overhead where strips cannot run (nxs = 72 leaves no strip
room below 128bp).

Semantics source: antidiagonalSmithWaterman.c:82-92,290-335 via
kernels/wavefront.py; replaces the reference's one-block-per-pair
batching (smithWaterman.cu:466) with a dense column-stationary queue.
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


@dataclasses.dataclass
class SWRotorPacked:
    """Rotor-packed SW jobs: tiles of 128 lanes x P queue slots.

    xrev: (NT, NB, 128) int8 - reversed x stream, xrev[A - u] holds the
          code for schedule coordinate u (= sx_q[r-1] at u = qT + r for
          r in [1, nx_q]; PAD_X at r = 0 and pad rows)
    ybuf: (NT, NY, 128) int8 - ybuf[qT + p] = sy_q[p] (PAD_STREAM
          beyond ny_q); row d-1 feeds the wrap row's refresh at step d
    perm: original pair index of (tile, slot, lane), slot-major
    """

    xrev: np.ndarray
    ybuf: np.ndarray
    period: int  # T
    n_slots: int  # P
    anchor: int  # A
    unroll: int
    perm: np.ndarray
    n_valid: int


def pack_sw_rotor(pairs, idx=None, max_slots: int = 64,
                  unroll: int = 8) -> SWRotorPacked:
    """Pack pairs (optionally a subset via idx) for the rotor kernel.
    Requires max(nx, ny) + 1 <= T for every pair; the period is the
    bucket max rounded to lcm(8, unroll) so harvest blocks align."""
    if unroll not in (8, 16, 24, 32):
        raise ValueError(f"unroll must be 8/16/24/32, got {unroll}")
    if idx is None:
        idx = np.arange(len(pairs))
    idx = np.asarray(idx)
    n = len(idx)
    maxlen = max(max(len(pairs[i].sx), len(pairs[i].sy)) for i in idx)
    tq = np.lcm(8, unroll)
    T = _round_up(maxlen + 1, tq)
    nt = max(1, -(-n // (LANES * max_slots)))
    P = -(-n // (LANES * nt))
    max_d = (P + 1) * T + unroll  # last block runs through this step
    A = _round_up(max_d, 8)
    NB = A + T + 8
    NY = _round_up(max_d, 8)

    # sort by length so co-tiled queues have similar periods when the
    # caller ever splits buckets; stable to keep perm deterministic
    order = np.argsort(
        [max(len(pairs[i].sx), len(pairs[i].sy)) for i in idx],
        kind="stable")
    idx = idx[order]

    xrev = np.full((nt, NB, LANES), PAD_X, np.int8)
    ybuf = np.full((nt, NY, LANES), PAD_STREAM, np.int8)
    for s, gi in enumerate(idx):
        p = pairs[gi]
        t, rem = divmod(s, P * LANES)
        q, lane = divmod(rem, LANES)
        xs = np.frombuffer(p.sx, np.uint8)
        _reject_pad_codes(xs, "sx")
        # xrev[A - (qT + r)] = sx[r-1], r = 1..nx  -> contiguous reversed
        hi = A - q * T  # exclusive row A - qT - 1 + 1
        xrev[t, hi - len(xs) : hi, lane] = xs[::-1]
        ys = np.frombuffer(p.sy, np.uint8)
        _reject_pad_codes(ys, "sy")
        v0 = q * T
        ybuf[t, v0 : v0 + len(ys), lane] = ys
    return SWRotorPacked(
        xrev=xrev, ybuf=ybuf, period=T, n_slots=P, anchor=A,
        unroll=unroll, perm=idx, n_valid=n,
    )


def _kernel(xrev_ref, ybuf_ref, out_ref, zscr, syb, *, cfg: SWConfig,
            T: int, P: int, A: int, unroll: int, interpret: bool):
    """One lane-tile of the rotor sweep.

    Boundary exactness (the invariants any edit must re-prove):
      * Dn[T-1] == 0 every step: sub and ogev carry -KILL at row T-1,
        so Dn = max(-huge, max(D2 - KILL, 0)) = 0. The roll wrap then
        gives D1[0] = 0 = D(r, 0), the exact left boundary.
      * Pn[T-1] == -KILL every step (kT1/gevP pins), so P1[0] = -KILL
        and Pn[0] = max(D1[0]=0, -KILL+ge) = 0 = P'(r, 1) exactly
        (P'(r,1)=0 and -KILL are downstream-equivalent: both lose to
        D >= 0 > ge in every consumer - wavefront.py module proof).
      * Dn[p*] and Qn[p*] are select-forced to 0 at the wrap row
        (r = 0 slot): its D2/Dv/Qv inputs are pair q-1's LAST pad row,
        which pad-code decay bounds but does NOT zero; without the
        force, a long gap chain through pair q-1's pad rows would leak
        into pair q's top boundary. Dn[p*]=0 then feeds pair q's
        D(0, c) = 0 via the unrolled vertical carries; Qn[p*]=0 gives
        Q'(1, c) = max(0, 0 + ge) = 0, the exact top boundary.
      * The wrap row's own P chain needs no force: by induction
        Pn[p*] = max(D1[p*-1 prev wrap]=0, P1(prev boundary <=0)+ge)
        = 0, the exact boundary value.
    """
    ge = cfg.gap_extend
    og_e = cfg.gap_open + cfg.gap_extend
    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    zscr[:] = jnp.zeros((T, LANES), jnp.int32)
    z = zscr[:]
    syb[:] = jnp.zeros((T, LANES), jnp.int32)  # PAD_STREAM init
    ii = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)
    rowT1 = ii == T - 1
    subm = jnp.where(rowT1, -KILL, z + cfg.match)
    subx = jnp.where(rowT1, -KILL, z + cfg.mismatch)
    ogev = jnp.where(rowT1, -KILL, z + og_e)
    gevP = jnp.where(rowT1, -KILL, z + ge)
    kT1 = jnp.where(rowT1, -KILL, z)

    n_blocks = (P + 1) * T // unroll + 1

    def block(blk, st):
        P1, D1, D2, Dv, Qv, mx, harv = st
        d0 = blk * unroll + 1
        m = (d0 - 1) // T
        isb = m * T == d0 - 1
        rst0 = d0 - 1 - m * T  # (d0-1) mod T, in [0, T-1]

        # once-per-period harvest: pair m-2's column maxes finished
        # collecting at step mT; T % unroll == 0 puts the boundary at
        # block start (module docstring)
        @pl.when(isb & (m >= 2) & (m - 2 < P))
        def _():
            score = jnp.max(harv.astype(jnp.int32), axis=0,
                            keepdims=True)
            out_ref[pl.ds(m - 2, 1), :] = score

        for tt in range(unroll):
            d = d0 + tt
            pv = rst0 + tt
            pstar = jnp.where(pv >= T, pv - T, pv)
            wrap = ii == pstar
            # refresh the wrap row's y code (its own step is the r=0
            # boundary: x there is PAD_X, mismatch either way)
            syb[pl.ds(pstar, 1), :] = ybuf_ref[0, pl.ds(d - 1, 1), :]
            syw = syb[:]
            xw = xrev_ref[0, pl.ds(A - d + 1, T), :]
            Pn = jnp.maximum(D1 + kT1, P1 + gevP)
            Qn = jnp.where(wrap, 0, jnp.maximum(Dv, Qv + ge))
            sub = jnp.where(xw == syw, subm, subx)
            Dn = jnp.maximum(jnp.maximum(Pn, Qn) + ogev,
                             jnp.maximum(D2 + sub, 0))
            Dn = jnp.where(wrap, 0, Dn)
            harv = jnp.where(wrap, mx, harv)
            mx = jnp.maximum(jnp.where(wrap, 0, mx), Dn)
            P1, D1, D2, Dv, Qv = roll1(Pn), roll1(Dn), D1, Dn, Qn
        return (P1, D1, D2, Dv, Qv, mx, harv)

    st = jax.lax.fori_loop(0, n_blocks, block, (z, z, z, z, z, z, z))
    del st


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "period", "n_slots", "anchor", "unroll",
                     "interpret"),
)
def sw_forward_pallas_rotor(
    xrev: jax.Array,  # (NT, NB, 128) int8/int32
    ybuf: jax.Array,  # (NT, NY, 128) int8/int32
    *,
    cfg: SWConfig = SWConfig(),
    period: int,
    n_slots: int,
    anchor: int,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NT * P8, 128) int32 scores, P8 = round_up(P, 8); row q
    of a tile's block = queue slot q's score."""
    xrev = xrev.astype(jnp.int32)
    ybuf = ybuf.astype(jnp.int32)
    nt = xrev.shape[0]
    p8 = _round_up(n_slots, 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, xrev.shape[1], LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ybuf.shape[1], LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p8, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((period, LANES), jnp.int32),
            pltpu.VMEM((period, LANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cfg=cfg, T=period, P=n_slots, A=anchor,
            unroll=unroll, interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * p8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xrev, ybuf)
    return out


def maybe_prep_rotor(cfg, bucket, n_shards: int = 1):
    """Routing predicate for the rotor kernel, shared by engines and
    bench harnesses: requires cfg.sw_rotor, no explicit sw_stack
    opt-in, and a bucket small enough that every pair fits one rotor
    period T = round_up(max(nx, ny) + 1, 8) <= cfg.rotor_max_period
    (both sequences bound T — a short-x/long-y bucket declines).
    Returns ((xrev, ybuf), statics)-or-None; statics feed
    sw_forward_pallas_rotor_bucket. ``n_shards``: the sharded engine
    needs the rotor tile count divisible by the mesh's data axis."""
    if not cfg.sw_rotor or cfg.sw_stack >= 2:
        return None
    maxlen = max(int(bucket.nx.max()), int(bucket.ny.max())) - 1
    T = _round_up(maxlen + 1, 8)
    if T > cfg.rotor_max_period:
        return None
    # Geometry gate: rotor sweeps T*T slots/pair at an 18-op step; the
    # resident kernel sweeps nxs*nd at 12 ops. Route rotor only when
    # 1.5*T^2 < nxs*nd_max — the model back-predicts every measured r5
    # point (64bp square: routes, measured +32..45%; 60x130bp ragged:
    # declines, resident's shorter window wins; 128bp square: routes
    # when strips doesn't claim it first, measured +37% over resident).
    if 3 * T * T > 2 * bucket.sx.shape[1] * int(bucket.max_diags):
        return None
    return prep_bucket_rotor(bucket, T, cfg.rotor_max_slots,
                             n_shards=n_shards)


def _pick_unroll(T: int) -> int:
    """Largest supported block length dividing the period (harvest
    blocks must start at period boundaries). Bigger blocks amortize
    the per-step scalar work: u24 measured +7% over u8 at T=72."""
    for u in (32, 24, 16, 8):
        if T % u == 0:
            return u
    return 8


def prep_bucket_rotor(bucket, T: int, max_slots: int = 32,
                      unroll: int | None = None, n_shards: int = 1):
    """Re-pack an SWPacked bucket (pack/bucketing.py layout: sublane-
    fixed x codes + reversed y stream) into the rotor layout. Bucket
    tile t becomes queue slot q = t % P of rotor tile t_r = t // P, so
    rotor output row t_r*P + q IS bucket tile t — the engine's
    unpack_scores needs no change (sw_forward_pallas_rotor_bucket does
    the p8->P row compaction). Handles both full-stream and StreamBand
    buckets (the band re-materializes host-side here; the rotor ships
    ~the band's payload anyway: T rows per tile vs max_len)."""
    from genomax.pack.bucketing import StreamBand

    if unroll is None:
        unroll = _pick_unroll(T)
    sx = bucket.sx
    nt, nxs, _ = sx.shape
    # Only live tiles join queues: a pad tile would sweep a FULL rotor
    # period (queues have no ndiag_tile early-exit), and the engine's
    # tile quantization adds up to ~15% of them. Output rows past the
    # live range are never read by unpack_scores (perm has n_valid
    # entries), so the result array may be shorter than the bucket NT.
    nt = min(nt, -(-bucket.n_valid // LANES))
    # minimal queue depth covering the live tiles: nt_r * P - nt pad
    # queues sweep full periods, so pick P = ceil(nt / nt_r), not the
    # flat cap (196 tiles: P=28 x 7, not 32 x 7 with 28 dead queues);
    # the sharded engine additionally needs nt_r % n_shards == 0
    nt_r = -(-(-(-nt // max_slots)) // n_shards) * n_shards
    P = -(-nt // nt_r)
    max_d = (P + 1) * T + unroll
    A = _round_up(max_d, 8)
    NB = A + T + 8
    NY = _round_up(max_d, 8)
    xrev = np.full((nt_r, NB, LANES), PAD_X, np.int8)
    ybuf = np.full((nt_r, NY, LANES), PAD_STREAM, np.int8)
    sy = bucket.sy
    if isinstance(sy, StreamBand):
        stream = sy.band
        sa = stream.shape[1]  # the band's local anchor (fill_anchor)
    else:
        stream = sy
        sa = sy.shape[1] - nxs  # nds = anchor + nxs (pack_sw_pairs)
    W = min(nxs, T) - 1  # x code rows 1..W of the bucket tile
    H = min(T, sa)
    for t in range(nt):
        t_r, q = divmod(t, P)
        # xrev[A - u] = x code at u = qT + r, r in [1, W]
        xrev[t_r, A - q * T - W : A - q * T, :] = sx[t, 1 : W + 1, :][::-1]
        # ybuf[qT + p] = sy[p]: the bucket stream holds sy[k] at row
        # sa - 1 - k, so the flipped top-H slice is exactly sy[0..H)
        ybuf[t_r, q * T : q * T + H, :] = stream[t, sa - H : sa, :][::-1]
    statics = dict(period=T, n_slots=P, anchor=A, unroll=unroll)
    return (xrev, ybuf), statics


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "period", "n_slots", "anchor", "unroll",
                     "interpret"),
)
def sw_forward_pallas_rotor_bucket(
    xrev, ybuf, *, cfg: SWConfig = SWConfig(), period: int,
    n_slots: int, anchor: int, unroll: int = 8,
    interpret: bool = False,
):
    """Engine-facing wrapper: returns (nt_r * P, 128) int32 scores in
    BUCKET tile order (see prep_bucket_rotor; rows past the bucket's
    live tiles, if any, are pad-queue zeros that unpack_scores never
    reads). One jit so the row compaction fuses into the kernel
    dispatch (separate host-issued reshape ops measured 6x on the
    tunneled host: each unjitted op is its own PJRT round-trip)."""
    out = sw_forward_pallas_rotor(
        xrev, ybuf, cfg=cfg, period=period, n_slots=n_slots,
        anchor=anchor, unroll=unroll, interpret=interpret,
    )
    p8 = _round_up(n_slots, 8)
    nt_r = out.shape[0] // p8
    return out.reshape(nt_r, p8, LANES)[:, :n_slots].reshape(-1, LANES)


def unpack_rotor(b: SWRotorPacked, res, n_total: int) -> np.ndarray:
    """Scatter kernel output back to original pair order."""
    res = np.asarray(res)
    p8 = _round_up(b.n_slots, 8)
    out = np.zeros(n_total, np.int32)
    s = np.arange(len(b.perm))
    t, rem = np.divmod(s, b.n_slots * LANES)
    q, lane = np.divmod(rem, LANES)
    out[b.perm] = res[t * p8 + q, lane]
    return out


def sw_scores_rotor(pairs, cfg: SWConfig = SWConfig(), idx=None,
                    max_slots: int = 64, unroll: int = 8,
                    interpret: bool = False) -> np.ndarray:
    """Scores for short SWPair jobs through the rotor kernel."""
    b = pack_sw_rotor(pairs, idx, max_slots, unroll)
    res = sw_forward_pallas_rotor(
        jnp.asarray(b.xrev), jnp.asarray(b.ybuf),
        cfg=cfg, period=b.period, n_slots=b.n_slots, anchor=b.anchor,
        unroll=b.unroll, interpret=interpret,
    )
    return unpack_rotor(b, res, len(pairs))
