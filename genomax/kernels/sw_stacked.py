"""Pallas TPU kernel: sublane-STACKED batched Smith-Waterman for short
pairs (the LEN<=64 regime where the resident kernel is step-overhead
bound).

At 64bp the resident kernel's arrays are 9 vregs tall and a sweep step
measures ~147 cyc where the ALU work alone accounts for ~40 (DESIGN.md
§3b: small heights sit on a fixed per-step latency/overhead floor —
round-2 probes showed unroll, grid interleave, and strips all fail to
move it, and the per-step floor is paid once per step regardless of
height). This kernel therefore makes the step TALLER instead of the
sweep shorter: S independent pairs are stacked along the sublane axis
of the same lane, giving (S*H, 128) arrays whose single per-step
roll/window-load/ALU issue amortizes the floor over S pairs.

The stacking trick is layout-only — the inner loop is IDENTICAL to the
resident kernel's (kernels/wavefront.py sw_block), because:

  * All S regions sweep IN PHASE (no skew): region q's cell rows are
    [q*H, (q+1)*H) and its stream is packed at the staggered anchor
    A + q*H, so the ONE contiguous window load rows [A-d, A-d+S*H)
    hands every region its own stream window — buffer[A - d + qH + s]
    = stream_q[d - 1 - s], the exact single-pair indexing, for every
    region simultaneously (algebra in prep_bucket_stacked).
  * Region isolation rides the existing -KILL boundary pinning at zero
    per-step cost: sw_make_consts(region_h=H) pins rows q*H (Q-kill)
    and q*H - 1 (D-pin), so the circular roll hands each region's row 0
    an exact 0 from the pinned bottom row above it — which IS the
    first-column boundary of the single-pair proof (wavefront.py).
  * Each region's triangle waste is unchanged (H rows x nd diags per
    pair); only the number of sweep STEPS per pair drops by S.

This differs from the round-2 "2-8 tiles per grid step" probe (DESIGN
§4), which kept S separate 9-vreg state arrays and so paid the
per-step floor S times — measured no change. Stacking issues each op
once over an (S*H, 128) array.

Semantics source: antidiagonalSmithWaterman.c:82-92,290-335 via
kernels/wavefront.py; the batching axis replaces alignGPU's
one-block-per-pair grid (smithWaterman.cu:466).
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
from genomax.kernels.wavefront import (
    LANES,
    sw_block,
    sw_make_consts,
    sw_make_state,
)
from genomax.pack.bucketing import PAD_STREAM, pad_tiles_to


def _kernel(nd_ref, sx_ref, sy_ref, out_ref, zscr, *, cfg: SWConfig,
            stack: int, h: int, unroll: int, interpret: bool):
    t = pl.program_id(0)
    nd = nd_ref[t]
    nxs = sx_ref.shape[1]  # = stack * h

    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    nds = sy_ref.shape[1]

    # Ghost-read mask (+3 VPU ops/step, the whole cost of stacking):
    # with anchors staggered by H, window row s_local of region q holds
    # the single-pair stream value ONLY for stream indices t = d-1-s_local
    # in [0, H): above that band (t >= H) the buffer row belongs to the
    # region BELOW (buffer row A + qH - 1 - t <= A + (q-1)H - 1), and
    # below it (t < 0) to the region ABOVE — real bases either way, so
    # ghost alignments against a neighbor's stream would inflate mx
    # (both directions caught by the differential adversaries in
    # tests/test_pallas_interpret.py). Forcing out-of-band rows to
    # PAD_STREAM restores the exact single-pair buffer contents (pads
    # beyond both stream ends), so the wavefront.py decay proof applies
    # verbatim per region. One unsigned compare covers both ends.
    smod = jax.lax.broadcasted_iota(jnp.int32, (nxs, LANES), 0) % h

    def window(d):
        syw = sy_ref[0, pl.ds(nds - nxs - d, nxs), :]
        t_vec = (d - 1) - smod  # per-region stream index of each row
        live = t_vec.astype(jnp.uint32) < jnp.uint32(h)  # 0 <= t < H
        return jnp.where(live, syw, PAD_STREAM)

    c = sw_make_consts(sx_ref[0], window, roll1, cfg, region_h=h)

    def outer(i, st):
        return sw_block(i * unroll, st, c, unroll)

    zscr[:] = jnp.zeros((nxs, LANES), sx_ref.dtype)
    n_blocks = (nd + unroll - 1) // unroll
    state = jax.lax.fori_loop(0, n_blocks, outer, sw_make_state(zscr[:]))
    mx = state[5].astype(jnp.int32)
    for q in range(stack):  # per-region score reduce, once per tile
        score = jnp.max(mx[q * h : (q + 1) * h], axis=0, keepdims=True)
        out_ref[8 * q : 8 * (q + 1), :] = jnp.broadcast_to(score, (8, LANES))


@functools.partial(
    jax.jit, static_argnames=("cfg", "stack", "h", "unroll", "interpret")
)
def sw_forward_pallas_stacked(
    sx: jax.Array,  # (NT, S*H, 128) int8/int32 stacked sublane codes
    sy: jax.Array,  # (NT, A+S*H, 128) int8/int32 staggered reversed streams
    ndiag_tile: jax.Array,  # (NT,) int32: max diags over the S regions
    *,
    stack: int,
    h: int,
    cfg: SWConfig = SWConfig(),
    unroll: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Returns (NT*stack, 128) int32 scores; flat row t*stack + q holds
    region q of tile t — the same linear slot order as the S source
    tiles, so unpack_scores works unchanged on the flattened result."""
    if unroll not in (1, 2, 4, 8, 16, 32):
        raise ValueError(
            f"unroll must be one of 1,2,4,8,16,32 (got {unroll}): the pack "
            "guarantees anchor >= nd + 32 (MAX_UNROLL) of sweep slack")
    sx = sx.astype(jnp.int32)
    sy = sy.astype(jnp.int32)
    nt, nxs, _ = sx.shape
    assert nxs == stack * h, (nxs, stack, h)
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
        out_specs=pl.BlockSpec((8 * stack, LANES), lambda t, nd: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nxs, LANES), sx.dtype)],
    )

    cost = pl.CostEstimate(
        flops=int(nt) * int(nxs) * int(nds) * LANES * 13,
        bytes_accessed=int(sx.size + sy.size) * sx.dtype.itemsize,
        transcendentals=0,
    )

    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, stack=stack, h=h, unroll=unroll,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * stack * 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, sx, sy)
    return out[::8]


def prep_bucket_stacked(bucket, stack: int):
    """Re-stack a packed SWPacked bucket S tiles deep (host, numpy slice
    copies). Returns ((sx', sy', ndt'), statics) or None if ineligible.

    Layout algebra: the resident pack puts tile codes at buffer rows
    [A - len, A), A = NDs - H, and the window for diagonal d is rows
    [A - d, A - d + H). Stacked, region q's cells read global window
    rows [A - d + qH, A - d + (q+1)H); placing region q's top-H rows of
    the old buffer at [A + qH - H, A + qH) makes those rows equal
    old_buffer[A - d + r_local] — the exact single-pair window — for
    every q at once. Adjacent regions' H-row copies are disjoint by
    construction; the copy is valid iff every stream's codes fit in the
    top H rows (codes = ny-1 <= H), which is also exactly the
    no-region-collision condition.

    Slot order: new tile t region q = old tile t*stack + q, so the
    kernel's flattened (NT*stack, 128) output preserves the bucket's
    linear slot indexing and unpack_scores needs no changes."""
    from genomax.pack.bucketing import StreamBand

    if isinstance(bucket.sy, StreamBand):
        # the re-stack below slices the host stream; band packs carry
        # only the live rows, so materialize the full buffer first
        # (engines skip band packing when stacking is enabled)
        bucket = dataclasses.replace(bucket, sy=bucket.sy.materialize())
    nt = bucket.sx.shape[0]
    h = bucket.sx.shape[1]
    nds = bucket.sy.shape[1]
    a0 = nds - h
    if stack < 2 or nt < 2:
        return None
    if h > a0:
        # The q=0 stream copy slices [a0-h, a0); a hand-built bucket
        # with h > a0 would wrap to a negative start and silently
        # mis-stack. Unreachable via pack_sw_pairs (the anchor is
        # STREAM_CHUNK-quantized >= n_diags >= nx), but this is a
        # public entry point — reject loudly like the sibling
        # strip_w/unroll guards (ADVICE r3).
        raise ValueError(
            f"bucket sublane window h={h} exceeds the stream anchor "
            f"a0={a0}; not a pack_sw_pairs-shaped bucket")
    if int(bucket.ny.max()) - 1 > h:  # stream codes must fit one region
        return None
    b = pad_tiles_to(bucket, stack)
    nt2 = b.sx.shape[0] // stack
    sx = np.empty((nt2, stack * h, LANES), b.sx.dtype)
    sy = np.full((nt2, a0 + stack * h, LANES), PAD_STREAM, b.sy.dtype)
    ndt = np.empty((nt2, stack), np.int32)
    for q in range(stack):
        sx[:, q * h : (q + 1) * h, :] = b.sx[q::stack][:, :, :]
        sy[:, a0 + (q - 1) * h : a0 + q * h, :] = (
            b.sy[q::stack][:, a0 - h : a0, :])
        ndt[:, q] = b.ndiag_tile[q::stack]
    return (sx, sy, ndt.max(axis=1)), dict(stack=stack, h=h)


def maybe_prep_stacked(cfg, bucket):
    """Routing predicate for the stacked kernel, shared by engines and
    bench harnesses: requires cfg.sw_stack >= 2 and a sublane window
    short enough to be in the step-overhead-bound regime
    (cfg.stack_max_nxs). Returns prep-or-None."""
    if cfg.sw_stack < 2:
        return None
    if bucket.sx.shape[1] > cfg.stack_max_nxs:
        return None
    return prep_bucket_stacked(bucket, cfg.sw_stack)


def run_bucket_stacked(bucket, stack: int, cfg: SWConfig = SWConfig(),
                       unroll: int = 32, interpret: bool = False):
    """Dispatch one SWPacked bucket through the stacked kernel. Returns
    the (NT*stack, 128) device array (not fenced)."""
    prep = prep_bucket_stacked(bucket, stack)
    assert prep is not None, "bucket ineligible for stacking"
    (sx, sy, ndt), statics = prep
    return sw_forward_pallas_stacked(
        jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(ndt),
        cfg=cfg, unroll=unroll, interpret=interpret, **statics,
    )
