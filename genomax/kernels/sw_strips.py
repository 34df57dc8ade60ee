"""Pallas TPU kernel: batched strip-mined Smith-Waterman.

The lane-tile kernels (sw_pallas.py) sweep every diagonal over the full
(NXs, 128) sublane window, so ~half the swept cells are outside the
anti-diagonal band (the classic wavefront triangle waste: at 512bp,
padded/real ~2.05x). This kernel splits the x axis of each tile into K
strips of W sublanes swept SEQUENTIALLY, so strip k only sweeps its live
diagonals [kW, kW + ny + W) — the per-tile slot count drops from
NXs * n_diags to ~K*W * (ny + W), a ~1.55x cut at the 512bp headline
point (the same strip idea as kernels/sw_long.py, but batched over a
grid of tiles with the halo held in VMEM instead of an HBM FIFO, for
mid-size buckets where everything fits on chip).

Boundary rows flow between strips through two diagonal-indexed VMEM
halo buffers (D and Q bottom rows per diagonal), ping-ponged between
consecutive strips: strip k writes its bottom row at halo slot
[k % 2][s] (s = its local sweep index, global diagonal d = kW + s) and
reads its top-row inject for diagonal d from [(k-1) % 2][W + s] — the
writer's local index for the same global diagonal. Both buffers are
zeroed once per tile: strip 0 then reads exact zeros (the proven column-
boundary values, kernels/wavefront.py), and reads past a writer's sweep
hit zeros too (those correspond to cells past the matrix, where
injecting 0 only lowers dead pad cells — kernels/sw_long.py:16-21).

Parity: same recurrence, same packing (SWPacked with sx re-padded to
K*W rows), same pad-decay argument as the resident kernel; the circular
roll's wrap row is REPLACED by the halo inject every step, so the wrap
can never contaminate (the resident kernel instead pins boundary rows
via -KILL consts). Differentially tested vs the full-matrix oracle and
bit-compared against sw_forward_pallas on identical buckets.

Semantics source: antidiagonalSmithWaterman.c:82-92,290-335 (via
kernels/wavefront.py); the strip sweep replaces alignGPU's single
per-pair diagonal loop (smithWaterman.cu:266-350).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.config import SWConfig
from genomax.pack.bucketing import LANES, PAD_X, SUB_Q, _round_up


def pick_strip_w(nxs: int, nyt: int) -> int | None:
    """Strip width minimizing swept slots K(W)*W*(W + nyt), over sublane-
    quantum multiples (W is derived deterministically from the bucket
    shape, so each shape still compiles exactly one kernel). Exact
    division of nxs matters as much as small W: at nxs=520, W=104 (K=5,
    zero re-pad) measures 135.9 GCUPS vs 108.6 for W=128 (K=5, 120 dead
    rows). Returns None when no W < nxs is allowed (tiny buckets — the
    resident kernel has no triangle waste worth cutting there)."""
    best, bw = None, None
    for w in range(64, min(512, nxs - 1) + 1, SUB_Q):
        k = -(-nxs // w)
        slots = k * w * (w + nyt)
        if best is None or slots < best:
            best, bw = slots, w
    return bw


def _kernel(nd_ref, nyt_ref, sx_ref, sy_ref, out_ref, zscr, halo, hout, *,
            cfg: SWConfig, k_strips: int, w: int, anchor: int, hs: int,
            unroll: int, interpret: bool):
    nd = nd_ref[pl.program_id(0)]
    nyt = nyt_ref[pl.program_id(0)]
    ge = cfg.gap_extend
    og_e = cfg.gap_open + cfg.gap_extend
    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    zscr[:] = jnp.zeros((w, LANES), jnp.int32)
    z = zscr[:]
    halo[:] = jnp.zeros((4 * hs, LANES), jnp.int32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0) == 0

    # Per-strip sweep: covers every live diagonal of the strip's real
    # rows (row kW+r lives for d in [kW+r, kW+r+ny-1]); S <= anchor - 30
    # keeps the stream window loads (offset anchor - s) in bounds even
    # with the unroll round-up overshoot (pack: anchor >= nd + 32).
    S = jnp.minimum(w + nyt, nd)
    n_sub = (S + unroll - 1) // unroll

    mx = z
    for k in range(k_strips):
        sxb = sx_ref[0, k * w : (k + 1) * w, :]
        subm = (sxb - sxb) + cfg.match
        subx = (sxb - sxb) + cfg.mismatch
        wbase = (k % 2) * 2 * hs  # this strip's halo write slot
        rbase = ((k + 1) % 2) * 2 * hs  # neighbor's slot (strip 0: zeros)

        # Halo traffic is block-granular: one (unroll, 128) dynamic load
        # of the neighbor rows per block with static row extracts inside,
        # per-step bottom rows staged in a static-offset scratch and
        # flushed with one dynamic store per block. Measured on v5e this
        # is a wash vs per-step single-row dynamic accesses (152 vs 154
        # GCUPS — Mosaic handles both well); kept because it bounds the
        # dynamic-addressing work per block by construction.
        def block(sb, st, sxb=sxb, subm=subm, subx=subx, wbase=wbase,
                  rbase=rbase):
            P1, D1, D1s, Q1s, D2s, mx = st
            hdblk = halo[pl.ds(rbase + w + sb * unroll, unroll), :]
            hqblk = halo[pl.ds(rbase + hs + w + sb * unroll, unroll), :]
            prevD = None
            for tt in range(unroll):
                s = sb * unroll + tt  # local sweep idx; global d = kW + s
                syw = sy_ref[0, pl.ds(anchor - s, w), :]
                Pn = jnp.maximum(D1, P1 + ge)
                Qn = jnp.maximum(D1s, Q1s + ge)
                sub = jnp.where(syw == sxb, subm, subx)
                Dn = jnp.maximum(jnp.maximum(Pn, Qn) + og_e,
                                 jnp.maximum(D2s + sub, 0))
                if tt % 2 == 1:
                    mx = jnp.maximum(mx, jnp.maximum(prevD, Dn))
                elif tt == unroll - 1:
                    mx = jnp.maximum(mx, Dn)
                prevD = Dn
                hout[tt : tt + 1, :] = Dn[w - 1 : w, :]
                hout[unroll + tt : unroll + tt + 1, :] = Qn[w - 1 : w, :]
                D1sn = jnp.where(row0, hdblk[tt : tt + 1, :], roll1(Dn))
                Q1sn = jnp.where(row0, hqblk[tt : tt + 1, :], roll1(Qn))
                P1, D1, D1s, Q1s, D2s = Pn, Dn, D1sn, Q1sn, D1s
            halo[pl.ds(wbase + sb * unroll, unroll), :] = hout[:unroll, :]
            halo[pl.ds(wbase + hs + sb * unroll, unroll), :] = hout[unroll:, :]
            return (P1, D1, D1s, Q1s, D2s, mx)

        st = jax.lax.fori_loop(0, n_sub, block, (z, z, z, z, z, mx))
        mx = st[5]

    score = jnp.max(mx, axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(score, out_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("k_strips", "strip_w", "anchor", "cfg", "unroll",
                     "interpret"),
)
def sw_forward_pallas_strips(
    sx: jax.Array,  # (NT, K*W, 128) int8/int32, sublane-fixed codes
    sy: jax.Array,  # (NT, NDs, 128) int8/int32 reversed diagonal stream
    ndiag_tile: jax.Array,  # (NT,) int32
    nyt_tile: jax.Array,  # (NT,) int32: per-tile max ny (= len(sy)+1)
    *,
    k_strips: int,
    strip_w: int,
    anchor: int,  # the pack's stream anchor (NDs - original NXs)
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NT, 128) int32 scores (slot-major, like sw_forward_pallas)."""
    if unroll not in (1, 2, 4, 8, 16, 32):
        raise ValueError(
            f"unroll must be one of 1,2,4,8,16,32 (got {unroll}): the pack "
            "only guarantees anchor >= nd + 32 (MAX_UNROLL), so a larger "
            "unroll's block overshoot would drive the stream-window load "
            "offset (anchor - s) negative and silently mis-score")
    sx = sx.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    nt, nxs_pad, _ = sx.shape
    nds = sy.shape[1]
    assert nxs_pad == k_strips * strip_w, (nxs_pad, k_strips, strip_w)
    # Halo bound: S <= W + nyt <= W + anchor, plus unroll overshoot.
    hs = _round_up(anchor + strip_w + unroll, SUB_Q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nxs_pad, LANES), lambda t, nd, nyt: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nds, LANES), lambda t, nd, nyt: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, nd, nyt: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((strip_w, LANES), jnp.int32),
            pltpu.VMEM((4 * hs, LANES), jnp.int32),  # D/Q halos x 2 slots
            pltpu.VMEM((2 * unroll, LANES), jnp.int32),  # block halo-out
        ],
    )

    cost = pl.CostEstimate(
        flops=int(nt) * int(nxs_pad) * int(anchor) * LANES * 14,
        bytes_accessed=int(sx.size + sy.size) * sx.dtype.itemsize,
        transcendentals=0,
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, cfg=cfg, k_strips=k_strips, w=strip_w, anchor=anchor,
            hs=hs, unroll=unroll, interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, nyt_tile, sx, sy)
    return out[::8]


# Per-tile VMEM budget for the strips kernel (bytes). This is a
# ROUTING heuristic, not a capacity limit: v5e VMEM is 128 MiB
# (measured from a Mosaic allocation error, size=134217728), and the
# halo buffers compile fine at a 120 MB budget. The halo footprint
# (2 slots x D/Q, ~anchor+W rows each) scales with the stream length,
# so a big footprint means short-x/long-y — exactly the regime where
# the resident-streamed kernel already sweeps few dead diagonals and
# strips measured SLOWER (250bp x 5.3kbp: strips 11.7 vs streamed
# 12.6 GCUPS, r2 probe). The 10 MB budget doubles as that perf gate.
STRIPS_VMEM_BUDGET = 10 * 1024 * 1024


def prep_bucket_strips(bucket, strip_w: int | None = None):
    """Host-side prep for one SWPacked bucket: re-pad sx to K*W sublane
    rows (pad-code rows are inert), derive the per-tile max-ny array the
    kernel's sweep bound needs, and the static geometry. Returns
    (arrays, statics) for sw_forward_pallas_strips, or None when the
    bucket is too small to strip OR its VMEM footprint (halos + resident
    stream) would not fit — callers fall back to the resident/streamed
    kernels. Kept separate from the dispatch so callers can place the
    arrays on device ONCE and re-dispatch (a re-transfer of the packed
    buffers costs seconds through the host tunnel)."""
    nxs = bucket.sx.shape[1]
    nds = bucket.sy.shape[1]
    anchor = nds - nxs
    nyt = bucket.ny.reshape(-1, LANES).max(axis=1).astype(np.int32)
    if strip_w is None:
        strip_w = pick_strip_w(nxs, int(nyt.max()))
        if strip_w is None:
            return None
    elif not 1 <= strip_w <= nxs:
        raise ValueError(
            f"strip_w must be in [1, NXs={nxs}] (got {strip_w}): each "
            "strip's stream-window load reads strip_w rows from a "
            "buffer whose bounds only cover the bucket's NXs, so an "
            "oversized strip_w reads past the buffer and silently "
            "mis-scores (the sibling unroll knob raises the same way)")
    k = -(-nxs // strip_w)
    hs = _round_up(anchor + strip_w + 32, SUB_Q)
    vmem = (4 * hs + 2 * (k * strip_w + nds)) * LANES * 4
    if vmem > STRIPS_VMEM_BUDGET:
        return None
    sx = bucket.sx
    if k * strip_w != nxs:
        pad = np.full((sx.shape[0], k * strip_w - nxs, LANES), PAD_X, sx.dtype)
        sx = np.concatenate([sx, pad], axis=1)
    arrays = (sx, bucket.sy, bucket.ndiag_tile, nyt)
    statics = dict(k_strips=k, strip_w=strip_w, anchor=anchor)
    return arrays, statics


def maybe_prep_strips(cfg, bucket):
    """THE routing predicate for the strip-mined kernel, shared by the
    local engine, the sharded engine, and the bench harnesses (so the
    gates cannot drift): requires cfg.sw_strips, a sublane window of at
    least cfg.strips_min_nxs, a VMEM-resident stream buffer
    (cfg.stream_vmem_rows), and a fitting VMEM footprint
    (prep_bucket_strips). Returns prep-or-None."""
    if not cfg.sw_strips:
        return None
    if bucket.sx.shape[1] < cfg.strips_min_nxs:
        return None
    if bucket.sy.shape[1] > cfg.stream_vmem_rows:
        return None
    return prep_bucket_strips(bucket)


def run_bucket_strips(bucket, cfg: SWConfig = SWConfig(), strip_w: int | None = None,
                      unroll: int = 32, interpret: bool = False):
    """Dispatch one SWPacked bucket through the strip-mined kernel.
    Returns the (NT, 128) device array (not fenced)."""
    prep = prep_bucket_strips(bucket, strip_w)
    assert prep is not None, "bucket too small for strips; route resident"
    (sx, sy, ndt, nyt), statics = prep
    return sw_forward_pallas_strips(
        jnp.asarray(sx),
        jnp.asarray(sy),
        jnp.asarray(ndt),
        jnp.asarray(nyt),
        cfg=cfg,
        unroll=unroll,
        interpret=interpret,
        **statics,
    )
