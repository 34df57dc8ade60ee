"""Ragged-length packing: bucket, pad and lay out alignment jobs as dense
(B, lanes) tiles for the wavefront kernels.

Replaces the reference's one-cudaMalloc-and-cudaMemcpy-per-string host
loop (smithWaterman.cu:421-454, pairHMM.cu:534-611) with packed dense
arrays. Ragged lengths (reads 10-247, haps 41-263 in 10s.in) are handled
exactly by per-pair length masks inside the kernels; bucketing by padded
shape only controls padding waste and compilation count.

Pairs inside a bucket are sorted by diagonal count so that each pair_tile
runs only as many wavefront steps as its longest member; the original
order is restored through ``perm`` at unpack time.

PairHMM read×haplotype cross-products are materialized as index maps into
per-read/per-hap tables and gathered once at pack time (numpy take), not
re-parsed per pair like the reference host loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from genomax.io.phred import phred_to_error_prob


def _round_up(x: int, q: int) -> int:
    return max(q, ((x + q - 1) // q) * q)


def _quantize_rows(n: int, pair_tile: int) -> int:
    """Pad a bucket's pair count to pair_tile * 2**k so the number of
    distinct compiled batch shapes stays bounded (each distinct row count
    is a separate XLA/Mosaic compilation)."""
    t = _round_up(n, pair_tile) // pair_tile
    p = 1
    while p < t:
        p *= 2
    return p * pair_tile


@dataclasses.dataclass
class SWPacked:
    """One shape-bucket of SW jobs, densely packed.

    sx   : (NP, NX) int32 — lane-fixed codes, lane j holds sx[j-1];
           out-of-range lanes pad with code 1 (sy pads with 2, so padded
           cells always mismatch and the kernels need no length masks)
    sy   : (NP, ND) int32 — the REVERSED diagonal stream: lane ND-1-d
           holds sy[d-1]. Kernels rotate this buffer right by one lane
           per wavefront step, which lands sy[d-1-k] at lane k on step d
           — a pure circular rotation, no inserts or dynamic indexing.
           ND = round_up(max diagonals, 128)
    nx,ny: (NP,) int32 — true matrix dims (len+1); padding rows use 1
    ndiag_tile: (NP // pair_tile,) int32 — max nx+ny-1 within each tile
    perm : (n_valid,) int64 — original pair index of packed row r (< n_valid)
    """

    sx: np.ndarray
    sy: np.ndarray
    nx: np.ndarray
    ny: np.ndarray
    ndiag_tile: np.ndarray
    perm: np.ndarray
    n_valid: int
    pair_tile: int

    @property
    def max_diags(self) -> int:
        return int(self.ndiag_tile.max())


@dataclasses.dataclass
class PairHMMPacked:
    """One shape-bucket of read×haplotype jobs.

    Lane axis = read position (lane i holds base/quality index i-1).
    rchar: (NP, NX) int32; qr/mmv/gapm/qi/qd/qg: (NP, NX) float32;
    hap: (NP, ND) int32 reversed diagonal stream (see SWPacked.sy);
    rl/hl: (NP,) int32 true lengths.
    """

    rchar: np.ndarray
    qr: np.ndarray
    mmv: np.ndarray
    gapm: np.ndarray
    qi: np.ndarray
    qd: np.ndarray
    qg: np.ndarray
    hap: np.ndarray
    rl: np.ndarray
    hl: np.ndarray
    ndiag_tile: np.ndarray
    perm: np.ndarray
    n_valid: int
    pair_tile: int

    @property
    def max_diags(self) -> int:
        return int(self.ndiag_tile.max())


def _tile_ndiags(ndiags: np.ndarray, pair_tile: int) -> np.ndarray:
    return ndiags.reshape(-1, pair_tile).max(axis=1).astype(np.int32)


def pack_sw_pairs(
    pairs, pair_tile: int = 8, lane_quantum: int = 128
) -> list[SWPacked]:
    """Bucket and pack SWPair jobs. Sequences are raw bytes (the '\\n'
    quirk is preserved upstream by the parser: a trailing newline byte is
    part of the sequence)."""
    n = len(pairs)
    sx_len = np.array([len(p.sx) for p in pairs], dtype=np.int64)
    sy_len = np.array([len(p.sy) for p in pairs], dtype=np.int64)
    nxq = np.array([_round_up(int(l) + 2, lane_quantum) for l in sx_len])
    nyq = np.array([_round_up(int(l) + 1, lane_quantum) for l in sy_len])

    out = []
    for key in sorted(set(zip(nxq.tolist(), nyq.tolist()))):
        nxp, nyp = key
        idx = np.nonzero((nxq == nxp) & (nyq == nyp))[0]
        ndiags = (sx_len[idx] + sy_len[idx] + 1).astype(np.int64)
        order = np.argsort(ndiags, kind="stable")
        idx = idx[order]
        np_pad = _quantize_rows(len(idx), pair_tile)
        ndp = _round_up(int(ndiags.max()), lane_quantum)

        # int16 would double VPU throughput but v5e Mosaic lacks i16
        # rotate/iota/compare; keep int32 until a packed-i32 scheme lands.
        sx = np.full((np_pad, nxp), 1, dtype=np.int32)
        sy = np.full((np_pad, ndp), 2, dtype=np.int32)
        nx = np.ones(np_pad, dtype=np.int32)
        ny = np.ones(np_pad, dtype=np.int32)
        for r, gi in enumerate(idx):
            p = pairs[gi]
            sx[r, 1 : len(p.sx) + 1] = np.frombuffer(p.sx, np.uint8)
            sy[r, 1 : len(p.sy) + 1] = np.frombuffer(p.sy, np.uint8)
            nx[r] = len(p.sx) + 1
            ny[r] = len(p.sy) + 1
        sy = sy[:, ::-1].copy()  # reversed diagonal stream (see docstring)
        ndiag = (nx.astype(np.int64) + ny - 1).astype(np.int32)
        out.append(
            SWPacked(
                sx=sx,
                sy=sy,
                nx=nx,
                ny=ny,
                ndiag_tile=_tile_ndiags(ndiag, pair_tile),
                perm=idx,
                n_valid=len(idx),
                pair_tile=pair_tile,
            )
        )
    assert sum(b.n_valid for b in out) == n
    return out


def unpack_scores(buckets, results, n_total: int, dtype=np.int32) -> np.ndarray:
    """Scatter per-bucket kernel outputs back to original pair order."""
    out = np.zeros(n_total, dtype=dtype)
    for b, r in zip(buckets, results):
        out[b.perm] = np.asarray(r)[: b.n_valid]
    return out


def pack_pairhmm_batches(
    batches,
    pair_tile: int = 8,
    lane_quantum: int = 128,
    phred_offset: float = 33.0,
) -> tuple[list[PairHMMPacked], int]:
    """Flatten batches into the global read-major pair list (the reference
    output order, pairHMMmatrix.c:207-258), decode phred once per read,
    then bucket/pack the read×haplotype cross-product."""
    reads = []  # (bases u8, qr, qi, qd, qg as f64 arrays)
    haps = []  # u8 arrays
    jobs_r = []
    jobs_h = []
    for b in batches:
        r0 = len(reads)
        h0 = len(haps)
        for rd in b.reads:
            bases = np.frombuffer(rd.bases, np.uint8)
            reads.append(
                (
                    bases,
                    phred_to_error_prob(np.frombuffer(rd.base_q, np.uint8), phred_offset),
                    phred_to_error_prob(np.frombuffer(rd.ins_q, np.uint8), phred_offset),
                    phred_to_error_prob(np.frombuffer(rd.del_q, np.uint8), phred_offset),
                    phred_to_error_prob(np.frombuffer(rd.gcp_q, np.uint8), phred_offset),
                )
            )
        for hp in b.haplotypes:
            haps.append(np.frombuffer(hp, np.uint8))
        for ri in range(len(b.reads)):
            for hi in range(len(b.haplotypes)):
                jobs_r.append(r0 + ri)
                jobs_h.append(h0 + hi)

    jobs_r = np.array(jobs_r, dtype=np.int64)
    jobs_h = np.array(jobs_h, dtype=np.int64)
    n = len(jobs_r)
    rlen = np.array([len(r[0]) for r in reads], dtype=np.int64)[jobs_r]
    hlen = np.array([len(h) for h in haps], dtype=np.int64)[jobs_h]
    nxq = np.array([_round_up(int(l) + 2, lane_quantum) for l in rlen])
    nyq = np.array([_round_up(int(l) + 1, lane_quantum) for l in hlen])

    out = []
    for key in sorted(set(zip(nxq.tolist(), nyq.tolist()))):
        nxp, nyp = key
        idx = np.nonzero((nxq == nxp) & (nyq == nyp))[0]
        order = np.argsort(rlen[idx] + hlen[idx], kind="stable")
        idx = idx[order]
        np_pad = _quantize_rows(len(idx), pair_tile)
        ndp = _round_up(int((rlen[idx] + hlen[idx] + 1).max()), lane_quantum)

        rchar = np.full((np_pad, nxp), 1, dtype=np.int32)
        qr = np.zeros((np_pad, nxp), dtype=np.float32)
        mmv = np.zeros((np_pad, nxp), dtype=np.float32)
        gapm = np.zeros((np_pad, nxp), dtype=np.float32)
        qi = np.zeros((np_pad, nxp), dtype=np.float32)
        qd = np.zeros((np_pad, nxp), dtype=np.float32)
        qg = np.zeros((np_pad, nxp), dtype=np.float32)
        hap = np.full((np_pad, ndp), 2, dtype=np.int32)
        rl = np.zeros(np_pad, dtype=np.int32)
        hl = np.ones(np_pad, dtype=np.int32)
        for r, gi in enumerate(idx):
            bases, Qr, Qi, Qd, Qg = reads[jobs_r[gi]]
            L = len(bases)
            rchar[r, 1 : L + 1] = bases
            qr[r, 1 : L + 1] = Qr
            mmv[r, 1 : L + 1] = 1.0 - (Qi + Qd)
            gapm[r, 1 : L + 1] = 1.0 - Qg
            qi[r, 1 : L + 1] = Qi
            qd[r, 1 : L + 1] = Qd
            qg[r, 1 : L + 1] = Qg
            h = haps[jobs_h[gi]]
            hap[r, 1 : len(h) + 1] = h
            rl[r] = L
            hl[r] = len(h)
        hap = hap[:, ::-1].copy()  # reversed diagonal stream
        ndiag = (rl.astype(np.int64) + hl + 1).astype(np.int32)
        out.append(
            PairHMMPacked(
                rchar=rchar,
                qr=qr,
                mmv=mmv,
                gapm=gapm,
                qi=qi,
                qd=qd,
                qg=qg,
                hap=hap,
                rl=rl,
                hl=hl,
                ndiag_tile=_tile_ndiags(ndiag, pair_tile),
                perm=idx,
                n_valid=len(idx),
                pair_tile=pair_tile,
            )
        )
    assert sum(b.n_valid for b in out) == n
    return out, n
