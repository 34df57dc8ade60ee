"""Cross-chip wavefront: ONE DP matrix partitioned across the device
mesh — the long-sequence path where even a single pair's state exceeds
one chip (SURVEY.md §7 step 7; the DP analog of context parallelism /
ring attention).

Layout: the x axis (sublanes) is split into K strips of W rows, strip k
on device k; up to 128 such huge pairs ride the lane axis. Execution is
**skewed**: device k runs ``unroll`` diagonals behind device k-1, so the
only communication is a per-block halo — the last-sublane rows of D and
Q for each of the block's diagonals — sent to the right neighbor with
``jax.lax.ppermute`` (ICI on a real slice). Inside a block every device
steps autonomously; halo row t replaces the sublane-0 wrap value of the
roll performed after diagonal start+t. Device 0 receives constant
zeros, which are provably equivalent to the single-chip pad-wrap
boundary (the D_wrap = 0 term dominates ``max(D_in, Q_in + gap_extend)``
for any Q_in <= 0).

The skew means block b on device k covers diagonals
[(b-k)*U, (b-k+1)*U); blocks before a strip's fill (d < 0) and after its
drain sweep pad stream windows (the packing reserves pad rows on both
sides of the codes), which the pad-code decay makes inert — the same
invariant the single-chip kernel relies on. Total blocks =
ceil(n_diags/U) + K - 1 (the classic pipeline fill/drain bubble; it
amortizes away when n_diags >> K*U, i.e. exactly the huge-pair regime
this path exists for).

SW only, deliberately: PairHMM's x axis is the READ (<= a few hundred
bp — nothing to shard), and long HAPLOTYPES are the stream axis, which
the HBM-streamed kernel already handles at any length on one chip
(kernels/pairhmm_pallas.py). Sharding PairHMM's read axis would add
cross-strip exponent reconciliation for no workload that needs it.

The per-block compute runs in a Pallas kernel (_strip_block_pallas),
fori-looped over 8-step sub-blocks so the block length U (the halo
message size / skew depth) is decoupled from compile cost (U=128
compiles in 8 s where a fully-unrolled U=32 took 53 s); only the
ppermute halo exchange and the block loop live at the XLA level.
Measured (1-device mesh, real v5e, 128 x 2000x2400bp): ~17 GCUPS on
real cells, FLAT across U in {32,128,256} — at K=1 the whole 2008-row
x axis is one strip, whose ~250 vregs/array of carried state spill,
and neither the per-block HBM carry round-trips (≈30 us of the 260 us
block) nor U is the limiter. On a real K-chip mesh each strip is K×
smaller (256 rows at K=8 — no spill), so this single-chip number is a
floor, not the expected multi-chip rate. The path exists for pairs too
big for ONE chip, where the trade is the point; single-chip workloads
route to kernels/sw_strips.py / sw_long.py instead.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from genomax.config import SWConfig
from genomax.dist.mesh import DATA_AXIS, shard_map_compat
from genomax.pack.bucketing import (
    LANES,
    PAD_STREAM,
    PAD_X,
    SUB_Q,
    _reject_pad_codes,
    _round_up,
)


SUB_U = 8  # static in-kernel sub-unroll; U must be a multiple


def _strip_block_pallas(sxb, slab, hD, hQ, state, *, w: int, U: int,
                        cfg: SWConfig, interpret: bool):
    """One skewed block (U diagonals) of one device's strip as a Pallas
    kernel — the in-kernel hot loop the CUDA reference keeps in
    alignGPU (smithWaterman.cu:266-350), at the multi-chip level. The
    caller (shard_fn) slices the stream slab so every window offset is
    STATIC inside the kernel, and handles the ppermute halo exchange
    outside; the kernel consumes the neighbor rows (hD/hQ) and produces
    this block's boundary rows (bD/bQ).

    slab: (w+U, 128) stream rows [A' - start - U, ...); the window for
    in-block step tt is slab[U - tt : U - tt + w)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(sxb_ref, slab_ref, hD_ref, hQ_ref, P1_ref, D1_ref, D1s_ref,
             Q1s_ref, D2s_ref, mx_ref, oP1, oD1, oD1s, oQ1s, oD2s, omx,
             obD, obQ):
        if interpret:
            roll1 = functools.partial(jnp.roll, shift=1, axis=0)
        else:
            roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731
        ge = cfg.gap_extend
        og_e = cfg.gap_open + cfg.gap_extend
        sxb_v = sxb_ref[:]
        subm = (sxb_v - sxb_v) + cfg.match
        subx = (sxb_v - sxb_v) + cfg.mismatch
        row0 = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0) == 0
        st0 = (
            P1_ref[:], D1_ref[:], D1s_ref[:], Q1s_ref[:], D2s_ref[:],
            mx_ref[:],
        )

        # fori over 8-step sub-blocks: compile cost stays bounded by the
        # static sub-unroll while U — and with it the halo message and
        # the carries' HBM round-trip amortization — can grow.
        subu = SUB_U if U % SUB_U == 0 else 1

        def sub(sb, st):
            P1, D1, D1s, Q1s, D2s, mx = st
            for tt in range(subu):
                idx = sb * subu + tt
                syw = slab_ref[pl.ds(U - idx, w), :]
                Pn = jnp.maximum(D1, P1 + ge)
                Qn = jnp.maximum(D1s, Q1s + ge)
                sub_ = jnp.where(syw == sxb_v, subm, subx)
                Dn = jnp.maximum(jnp.maximum(Pn, Qn) + og_e,
                                 jnp.maximum(D2s + sub_, 0))
                mx = jnp.maximum(mx, Dn)
                obD[pl.ds(idx, 1), :] = Dn[w - 1 : w, :]
                obQ[pl.ds(idx, 1), :] = Qn[w - 1 : w, :]
                hd = hD_ref[pl.ds(idx, 1), :]
                hq = hQ_ref[pl.ds(idx, 1), :]
                D1sn = jnp.where(row0, hd, roll1(Dn))
                Q1sn = jnp.where(row0, hq, roll1(Qn))
                P1, D1, D1s, Q1s, D2s = Pn, Dn, D1sn, Q1sn, D1s
            return (P1, D1, D1s, Q1s, D2s, mx)

        st = jax.lax.fori_loop(0, U // subu, sub, st0)
        P1, D1, D1s, Q1s, D2s, mx = st
        oP1[:], oD1[:], oD1s[:], oQ1s[:], oD2s[:], omx[:] = (
            P1, D1, D1s, Q1s, D2s, mx,
        )

    sh_w = jax.ShapeDtypeStruct((w, LANES), jnp.int32)
    sh_u = jax.ShapeDtypeStruct((U, LANES), jnp.int32)
    outs = pl.pallas_call(
        kern,
        out_shape=[sh_w] * 6 + [sh_u] * 2,
        interpret=interpret,
    )(sxb, slab, hD, hQ, *state)
    return tuple(outs[:6]), outs[6], outs[7]


@dataclasses.dataclass
class SWXPacked:
    """One tile of up to 128 huge pairs, x axis split into K strips.

    sx : (K*W, 128) int8 sublane-fixed codes (global sublane order)
    sy : (NDt, 128) int8 reversed stream; device k's window for diagonal
         d is rows [A + k*W - d, ... + W), A = NDt - (K-1)*(W+U) - W.
         A is sized past the full skewed sweep so every window load is
         in bounds and pre-fill/post-drain windows read only pad rows.
    """

    sx: np.ndarray
    sy: np.ndarray
    n_devices: int
    strip_w: int
    n_diags: int
    unroll: int
    anchor: int
    nx: np.ndarray
    ny: np.ndarray
    n_valid: int


def pack_sw_xsharded(pairs, n_devices: int, unroll: int = 16) -> SWXPacked:
    """Pack up to 128 pairs for the cross-chip wavefront."""
    assert len(pairs) <= LANES
    nxs = _round_up(max(len(p.sx) for p in pairs) + 2, SUB_Q)
    w = _round_up(-(-nxs // n_devices), SUB_Q)
    nd = max(len(p.sx) + len(p.sy) + 1 for p in pairs)
    # Anchor covers every diagonal any device visits, including the
    # K-1 drain blocks past ceil(nd/U)*U.
    anchor = _round_up(nd + (n_devices + 2) * unroll, SUB_Q)
    ndt = _round_up(anchor + (n_devices - 1) * (w + unroll) + w, SUB_Q)

    sx = np.full((n_devices * w, LANES), PAD_X, np.int8)
    sy = np.full((ndt, LANES), PAD_STREAM, np.int8)
    nx = np.ones(LANES, np.int32)
    ny = np.ones(LANES, np.int32)
    for l, p in enumerate(pairs):
        _reject_pad_codes(np.frombuffer(p.sx, np.uint8), "sx")
        _reject_pad_codes(np.frombuffer(p.sy, np.uint8), "sy")
        sx[1 : len(p.sx) + 1, l] = np.frombuffer(p.sx, np.uint8)
        sy[anchor - len(p.sy) : anchor, l] = np.frombuffer(p.sy, np.uint8)[::-1]
        nx[l] = len(p.sx) + 1
        ny[l] = len(p.sy) + 1
    return SWXPacked(
        sx=sx, sy=sy, n_devices=n_devices, strip_w=w, n_diags=nd,
        unroll=unroll, anchor=anchor, nx=nx, ny=ny, n_valid=len(pairs),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "strip_w", "n_diags", "unroll", "anchor", "cfg",
                     "interpret"),
)
def sw_forward_xsharded(
    sx,  # (K*W, 128) int8/int32, sharded along sublanes
    sy,  # (NDt, 128) int8/int32, replicated
    *,
    mesh,
    strip_w: int,
    n_diags: int,
    unroll: int = 16,
    anchor: int | None = None,  # the pack's stream anchor (SWXPacked.anchor)
    cfg: SWConfig = SWConfig(),
    interpret: bool = False,
):
    """Returns (128,) int32 scores for one tile of huge pairs.

    ``anchor`` must be the pack's stream anchor (SWXPacked.anchor): a
    reconstruction from the buffer shape is wrong whenever the pack's
    final SUB_Q round-up of ndt moved (ADVICE r1 — unroll 1/2/4 with
    some device counts silently misreads the stream)."""
    import jax.numpy as jnp

    from jax.sharding import PartitionSpec as P

    if anchor is None:
        raise ValueError("pass anchor=SWXPacked.anchor (see docstring)")

    k_devices = mesh.devices.size
    w, U = strip_w, unroll
    n_blocks = -(-n_diags // U) + k_devices - 1

    def shard_fn(sx_s, sy_s):
        k = jax.lax.axis_index(DATA_AXIS)
        sxb = sx_s.astype(jnp.int32)
        syb = sy_s.astype(jnp.int32)
        a_base = anchor
        is0 = k == 0
        perm = [(i, i + 1) for i in range(k_devices - 1)]

        z = jnp.zeros((w, LANES), jnp.int32)
        zh = jnp.zeros((U, LANES), jnp.int32)

        def outer(b, st):
            P1, D1, D1s, Q1s, D2s, mx, haloD, haloQ = st
            # Boundary rows for this block's diagonal range, produced by
            # the left neighbor one outer iteration ago (device 0 gets
            # the pad-equivalent zeros). The ppermute rides ICI on a
            # real slice; the per-block compute is the Pallas kernel.
            hD = jnp.where(is0, 0, jax.lax.ppermute(haloD, DATA_AXIS, perm))
            hQ = jnp.where(is0, 0, jax.lax.ppermute(haloQ, DATA_AXIS, perm))

            start = (b - k) * U  # this block's first diagonal
            # Stream rows [A' - start - U, + w+U), A' = a_base + k*w:
            # the union of the block's per-step windows (window for step
            # tt at static slab offset U - tt). In bounds for the whole
            # skewed sweep by the pack's anchor/ndt slack.
            slab = jax.lax.dynamic_slice_in_dim(
                syb, a_base + k * w - start - U, w + U, axis=0
            )
            state, bD, bQ = _strip_block_pallas(
                sxb, slab, hD, hQ, (P1, D1, D1s, Q1s, D2s, mx),
                w=w, U=U, cfg=cfg, interpret=interpret,
            )
            return (*state, bD, bQ)

        st = (z, z, z, z, z, z, zh, zh)
        st = jax.lax.fori_loop(0, n_blocks, outer, st)
        local = jnp.max(st[5], axis=0)
        return jax.lax.pmax(local, DATA_AXIS)

    return shard_map_compat(
        shard_fn, mesh, (P(DATA_AXIS), P()), P()
    )(sx, sy)
