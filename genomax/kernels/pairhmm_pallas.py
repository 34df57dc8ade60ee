"""Pallas TPU kernel: batched PairHMM forward (fp32 + exponent tracking).

TPU-native successor of align1thread (pairHMM.cu:249-368): one lane-tile
of 128 read×haplotype pairs per grid step, M/X/Y rotating diagonals as
sublane-major (NXs, 128) VMEM vectors, haplotype chars consumed through
dynamic-offset sublane loads of the reversed stream, all per-base quality
arrays sublane-fixed. The reference needs fp64 and a DBL_MAX/16 scaling
constant; the TPU kernel runs fp32 with a per-pair power-of-two exponent
shift (see kernels/wavefront.py docstring), rescaled once per unrolled
block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomax.kernels.wavefront import (
    LANES,
    phmm_finalize,
    phmm_make_consts,
    phmm_make_state,
    phmm_rescale,
    phmm_step,
    wavefront_sweep,
)

import numpy as np


@functools.partial(jax.jit, static_argnames=("phred_offset",))
def expand_byte_quals(qb, phred_offset: float = 33.0):
    """Expand raw phred+33 quality bytes (PairHMMPacked.qb,
    (NT, 4, NXs, 128) int8, planes base/ins/del/gcp) into the six fp32
    tables the kernels consume — ON DEVICE, so the host ships ~5.6x
    fewer bytes per batch (the reference decodes on host into doubles,
    pairHMMmatrix.c qual-to-prob; genomax moves the decode past the
    PCIe/ICI boundary).

    LUT entries below the phred offset are exact 0.0: real quality
    bytes are >= offset (printable phred+33), so only layout pads
    (byte 0) hit them — preserving the pad-decay invariant (all six
    tables exactly 0 at pad cells, byte-identical to the fp32 packers'
    calloc pages). mmv/gapm are additionally gated on the pad mask
    since their pad value must be 0, not 1. fp32 rounding note: the
    host packer computes 1-(Qi+Qd) in fp64 then casts; here the sum is
    fp32 — differs by <=1 ulp, far inside the 1e-4 parity envelope.
    """
    # The pad-decay invariant below zeroes LUT entries < phred_offset;
    # with offset < 1 NOTHING is zeroed, so a legitimate qual byte 0
    # would collide with the byte-0 pad sentinel and mark live cells
    # dead (ADVICE r3). No real encoding has offset < 33.
    if phred_offset < 1.0:
        raise ValueError(
            f"phred_offset={phred_offset} < 1 breaks the byte-0 pad "
            "sentinel (lut[0] must be exactly 0)")
    lut_np = np.power(10.0, -(np.arange(256) - phred_offset) / 10.0)
    lut_np[: max(0, int(np.ceil(phred_offset)))] = 0.0
    lut = jnp.asarray(lut_np.astype(np.float32))
    idx = qb.astype(jnp.uint8).astype(jnp.int32)
    qr = jnp.take(lut, idx[:, 0], axis=0)
    qi = jnp.take(lut, idx[:, 1], axis=0)
    qd = jnp.take(lut, idx[:, 2], axis=0)
    qg = jnp.take(lut, idx[:, 3], axis=0)
    live = idx[:, 0] != 0
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    mmv = jnp.where(live, one - (qi + qd), zero)
    gapm = jnp.where(live, one - qg, zero)
    return qr, mmv, gapm, qi, qd, qg


@functools.partial(jax.jit, static_argnames=("phred_offset",))
def expand_factored(rchar_u, qb_u, hap_u, ridx, hidx,
                    phred_offset: float = 33.0):
    """Rebuild job tiles from a FACTORED pack (PairHMMPacked.rchar_u /
    qb_u / hap_u + ridx/hidx gather indices): the read×haplotype
    cross-product ships each unique read/hap once and this gathers +
    transposes them back into the sublane-major (NT, rows, 128) tiles —
    on DEVICE at HBM rate, so the host ships ~NH-fold fewer bytes than
    even the byte-qual pack. Returns (rchar, six qual tables, hap)
    bit-identical to the unfactored tiles (tests/test_nibble.py)."""
    rchar = jnp.swapaxes(jnp.take(rchar_u, ridx, axis=0), 1, 2)
    qb = jnp.transpose(jnp.take(qb_u, ridx, axis=0), (0, 2, 3, 1))
    hap = jnp.swapaxes(jnp.take(hap_u, hidx, axis=0), 1, 2)
    return (rchar,) + expand_byte_quals(qb, phred_offset) + (hap,)


def _kernel(
    nd_ref,
    rchar_ref,
    qr_ref,
    mmv_ref,
    gapm_ref,
    qi_ref,
    qd_ref,
    qg_ref,
    hap_ref,
    meta_ref,
    out_ref,
    zscr,
    *,
    unroll: int,
    interpret: bool,
    mm_div: float,
    bitmask: bool,
):
    t = pl.program_id(0)
    nd = nd_ref[t]
    nxs = rchar_ref.shape[1]

    if interpret:
        roll1 = functools.partial(jnp.roll, shift=1, axis=0)
    else:
        roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731

    nds = hap_ref.shape[1]

    def window(d):
        return hap_ref[0, pl.ds(nds - nxs - d, nxs), :]

    meta = meta_ref[0]
    c = phmm_make_consts(
        rchar_ref[0],
        qr_ref[0],
        mmv_ref[0],
        gapm_ref[0],
        qi_ref[0],
        qd_ref[0],
        qg_ref[0],
        meta[0:1],
        meta[1:2],
        window,
        roll1,
        mm_div,
        bitmask=bitmask,
    )

    def body(d, state):
        return phmm_step(d, state, c)

    def block(state, d):
        return phmm_rescale(state, d, c)

    zscr[:] = jnp.zeros((nxs, LANES), jnp.float32)
    state = wavefront_sweep(
        nd, phmm_make_state(zscr[:], c.y0row), body, unroll=unroll,
        block_fn=block
    )
    res = phmm_finalize(state, c).reshape(1, LANES)
    out_ref[:] = jnp.broadcast_to(res, out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("rescale_period", "interpret", "mm_div",
                              "bitmask")
)
def pairhmm_forward_pallas(
    rchar: jax.Array,  # (NT, NXs, 128) int32 sublane-fixed read codes
    qr: jax.Array,  # (NT, NXs, 128) f32 — and mmv/gapm/qi/qd/qg likewise
    mmv: jax.Array,
    gapm: jax.Array,
    qi: jax.Array,
    qd: jax.Array,
    qg: jax.Array,
    hap: jax.Array,  # (NT, NDs, 128) int32 reversed diagonal stream
    meta: jax.Array,  # (NT, 8, 128) int32: row0=read_len, row1=hap_len
    ndiag_tile: jax.Array,  # (NT,) int32
    rescale_period: int = 32,  # == the unrolled block length
    interpret: bool = False,
    mm_div: float = 1.0,  # 3.0 = true GATK emission (PairHMMConfig)
    bitmask: bool = False,  # codes are one-hot (PairHMMPacked.bitmask_codes)
) -> jax.Array:
    """Returns (NT, 128) f32 log10 likelihoods (reference-constant-relative)."""
    rchar = rchar.astype(jnp.int32)  # int8 on the wire, int32 in VMEM
    hap = hap.astype(jnp.int32)
    nt, nxs, _ = rchar.shape
    nds = hap.shape[1]

    def vspec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda t, nd: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            vspec(nxs),  # rchar
            vspec(nxs),  # qr
            vspec(nxs),  # mmv
            vspec(nxs),  # gapm
            vspec(nxs),  # qi
            vspec(nxs),  # qd
            vspec(nxs),  # qg
            vspec(nds),  # hap (reversed stream)
            vspec(8),  # meta
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, nd: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nxs, LANES), jnp.float32)],
    )

    cost = pl.CostEstimate(
        flops=int(nt) * int(nxs) * int(nds) * LANES * 20,
        bytes_accessed=int(rchar.size * 8 + hap.size) * 4,
        transcendentals=int(nt) * LANES,
    )

    out = pl.pallas_call(
        functools.partial(_kernel, unroll=rescale_period, interpret=interpret,
                          mm_div=mm_div, bitmask=bitmask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(ndiag_tile, rchar, qr, mmv, gapm, qi, qd, qg, hap, meta)
    return out[::8]


# diagonals per HBM->VMEM slab DMA (streamed variant); single source of
# truth in genomax/layout.py — the pack's anchor quantization depends
# on this exact value
from genomax.kernels.wavefront import STREAM_CHUNK  # noqa: E402


def _kernel_streamed(
    nd_ref, rchar_ref, qr_ref, mmv_ref, gapm_ref, qi_ref, qd_ref, qg_ref,
    hap_hbm, meta_ref, out_ref, zscr, slab, sem, *, unroll: int,
    mm_div: float, bitmask: bool,
):
    """Streamed variant: the haplotype stream stays in HBM, slab-DMA'd
    per STREAM_CHUNK diagonals with double buffering — haplotype length
    bounded by HBM, not VMEM (see sw_pallas._kernel_streamed)."""
    import dataclasses

    t = pl.program_id(0)
    nd = nd_ref[t]
    nxs = rchar_ref.shape[1]
    nds = hap_hbm.shape[1]
    chunk = STREAM_CHUNK
    n_sub = chunk // unroll
    span = nxs + chunk
    roll1 = lambda x: pltpu.roll(x, 1, axis=0)  # noqa: E731
    a = nds - nxs

    meta = meta_ref[0]
    c = phmm_make_consts(
        rchar_ref[0], qr_ref[0], mmv_ref[0], gapm_ref[0], qi_ref[0],
        qd_ref[0], qg_ref[0], meta[0:1], meta[1:2], None, roll1, mm_div,
        bitmask=bitmask,
    )

    def dma(slot, ci):
        return pltpu.make_async_copy(
            hap_hbm.at[t, pl.ds(a - (ci + 1) * chunk, span), :],
            slab.at[pl.ds(slot * span, span), :],
            sem.at[slot],
        )

    dma(0, 0).start()
    n_chunks = (nd + chunk - 1) // chunk

    zscr[:] = jnp.zeros((nxs, LANES), jnp.float32)

    def process(ci, slot, st):
        def block(sb, st):
            d0 = ci * chunk + sb * unroll
            for tt in range(unroll):
                off = chunk - sb * unroll - tt
                cw = dataclasses.replace(
                    c, window=lambda d, o=off: slab[
                        pl.ds(slot * span + o, nxs), :]
                )
                st = phmm_step(d0 + tt, st, cw)
            return phmm_rescale(st, d0 + unroll - 1, c)

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
        0, (n_chunks + 1) // 2, pair_body, phmm_make_state(zscr[:], c.y0row)
    )
    res = phmm_finalize(state, c).reshape(1, LANES)
    out_ref[:] = jnp.broadcast_to(res, out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("rescale_period", "interpret", "mm_div",
                                    "bitmask"))
def pairhmm_forward_pallas_streamed(
    rchar: jax.Array,
    qr: jax.Array,
    mmv: jax.Array,
    gapm: jax.Array,
    qi: jax.Array,
    qd: jax.Array,
    qg: jax.Array,
    hap: jax.Array,  # (NT, NDs, 128) — stays in HBM
    meta: jax.Array,
    ndiag_tile: jax.Array,
    rescale_period: int = 32,
    interpret: bool = False,
    mm_div: float = 1.0,
    bitmask: bool = False,
) -> jax.Array:
    """pairhmm_forward_pallas with an HBM-resident haplotype stream."""
    if STREAM_CHUNK % rescale_period or rescale_period > 32:
        raise ValueError(
            f"rescale_period must be one of 1,2,4,8,16,32 "
            f"(got {rescale_period}); see sw_forward_pallas_streamed"
        )
    rchar = rchar.astype(jnp.int32)
    hap = hap.astype(jnp.int32)
    nt, nxs, _ = rchar.shape

    def vspec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda t, nd: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            vspec(nxs), vspec(nxs), vspec(nxs), vspec(nxs),
            vspec(nxs), vspec(nxs), vspec(nxs),
            pl.BlockSpec(memory_space=pl.ANY),  # hap stream in HBM
            vspec(8),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t, nd: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nxs, LANES), jnp.float32),
            pltpu.VMEM((2 * (nxs + STREAM_CHUNK), LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_streamed, unroll=rescale_period,
                          mm_div=mm_div, bitmask=bitmask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ndiag_tile, rchar, qr, mmv, gapm, qi, qd, qg, hap, meta)
    return out[::8]
