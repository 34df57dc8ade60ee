"""The actual Pallas kernel code path (ref window loads, rolls, rescale
blocks, scalar prefetch, output tiling) run under the Pallas interpreter
on CPU, differentially against the numpy full-matrix oracle — so kernel
regressions are caught without TPU hardware (SURVEY.md §4 test plan)."""

import numpy as np
import pytest

from genomax.config import EngineConfig
from genomax.engine.executor import Engine
from genomax.io.formats import SWPair
from genomax.io.generator import generate_pairhmm_batch
from genomax.kernels import oracle


@pytest.fixture(scope="module")
def eng():
    return Engine(EngineConfig(backend="pallas"), interpret=True)


def _random_pairs(rng, n, lo, hi, newline=True):
    out = []
    for _ in range(n):
        a = rng.choice(list(b"ATGC"), size=int(rng.integers(lo, hi))).astype(np.uint8)
        b = rng.choice(list(b"ATGC"), size=int(rng.integers(lo, hi))).astype(np.uint8)
        a, b = a.tobytes(), b.tobytes()
        if newline:
            a += b"\n"
            b += b"\n"
        if len(a) > len(b):
            a, b = b, a
        out.append(SWPair(sx=a, sy=b))
    return out


def test_sw_kernel_interpret_vs_oracle(eng):
    rng = np.random.default_rng(3)
    pairs = _random_pairs(rng, 12, 2, 40)
    got = eng.sw_scores(pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_sw_kernel_interpret_ragged_tiles(eng):
    rng = np.random.default_rng(4)
    # >128 pairs: exercises multiple grid tiles + per-tile ndiag early exit
    pairs = _random_pairs(rng, 140, 3, 30)
    got = eng.sw_scores(pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_pairhmm_kernel_interpret_vs_oracle(eng):
    batch = generate_pairhmm_batch(3, 2, read_len=17, hap_len=25, seed=8)
    got = eng.pairhmm([batch])
    want = oracle.pairhmm_batch_log10(batch)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pairhmm_kernel_interpret_rescale():
    # all-mismatch => decay past fp32 range; exercises the in-kernel
    # exponent rescale block (fallback disabled to test the fp32 path)
    eng = Engine(
        EngineConfig(backend="pallas", phmm_fallback_threshold=None),
        interpret=True,
    )
    batch = generate_pairhmm_batch(1, 1, read_len=48, hap_len=56, seed=13)
    batch.reads[0].bases = b"A" * 48
    batch.haplotypes[0] = b"C" * 56
    got = eng.pairhmm([batch])
    want = oracle.pairhmm_batch_log10(batch)
    assert want[0] < -30
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_sw_streamed_kernel_interpret(eng):
    """Long-y pairs route to the HBM-streamed slab-DMA kernel."""
    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine as _E

    e = _E(EngineConfig(backend="pallas", stream_vmem_rows=512), interpret=True)
    rng = np.random.default_rng(6)
    pairs = [
        SWPair(
            sx=rng.choice(list(b"ATGC"), 30).astype(np.uint8).tobytes(),
            sy=rng.choice(list(b"ATGC"), int(rng.integers(600, 900))).astype(np.uint8).tobytes(),
        )
        for _ in range(5)
    ]
    got = e.sw_scores(pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_pairhmm_streamed_kernel_interpret():
    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine as _E

    e = _E(EngineConfig(backend="pallas", stream_vmem_rows=512), interpret=True)
    batch = generate_pairhmm_batch(2, 2, read_len=18, hap_len=650, seed=4)
    got = e.pairhmm([batch])
    want = oracle.pairhmm_batch_log10(batch)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sw_long_strip_kernel_interpret():
    """The strip-mined long-pair kernel (HBM halo FIFO) vs the oracle,
    with several strips and strip-boundary-crossing alignments."""
    from genomax.kernels.sw_long import sw_scores_long

    rng = np.random.default_rng(9)
    ref = rng.choice(list(b"ATGC"), 300).astype(np.uint8).tobytes()
    pairs = [
        SWPair(sx=rng.choice(list(b"ATGC"), int(rng.integers(100, 280))).astype(np.uint8).tobytes(),
               sy=rng.choice(list(b"ATGC"), int(rng.integers(100, 300))).astype(np.uint8).tobytes())
        for _ in range(4)
    ]
    pairs.append(SWPair(sx=ref, sy=ref))  # max-score across every seam
    got = sw_scores_long(pairs, strip_w=64, interpret=True)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_sw_strips_kernel_interpret():
    """The batched strip-mined kernel (VMEM halo ping-pong) vs the
    oracle: random ragged pairs + strip-seam-crossing adversaries
    (identical pair = max score through every seam; tandem repeat =
    the circular-roll wrap trigger; all-mismatch = zero floor)."""
    from genomax.kernels.sw_strips import run_bucket_strips
    from genomax.pack.bucketing import pack_sw_pairs, unpack_scores

    rng = np.random.default_rng(12)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(12):
        a = rng.choice(abc, int(rng.integers(40, 90))).tobytes()
        b = rng.choice(abc, int(rng.integers(40, 90))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    x = rng.choice(abc, 60).tobytes()
    j = rng.choice(abc, 70).tobytes()
    pairs.append(SWPair(sx=x, sy=x + j + x))
    pairs.append(SWPair(sx=b"A" * 70, sy=b"T" * 90))
    s = rng.choice(abc, 80).tobytes()
    pairs.append(SWPair(sx=s, sy=s))
    pairs.append(SWPair(sx=b"A", sy=b"A"))

    buckets = pack_sw_pairs(pairs)
    res = [
        np.asarray(run_bucket_strips(b, strip_w=24, unroll=8, interpret=True))
        for b in buckets
    ]
    got = unpack_scores(buckets, res, len(pairs))
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_sw_strips_kernel_scoring_configs():
    """Non-default scoring params through the strip-mined kernel (the
    lax-backend config fuzz never exercises this path)."""
    from genomax.config import SWConfig
    from genomax.kernels.sw_strips import run_bucket_strips
    from genomax.pack.bucketing import pack_sw_pairs, unpack_scores

    rng = np.random.default_rng(21)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(6):
        a = rng.choice(abc, int(rng.integers(50, 80))).tobytes()
        b = rng.choice(abc, int(rng.integers(50, 80))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    for cfg in (SWConfig(match=2, mismatch=-3, gap_open=0, gap_extend=-1),
                SWConfig(match=3, mismatch=-2, gap_open=-7, gap_extend=-2)):
        buckets = pack_sw_pairs(pairs)
        res = [
            np.asarray(run_bucket_strips(b, cfg=cfg, strip_w=24, unroll=8,
                                         interpret=True))
            for b in buckets
        ]
        got = unpack_scores(buckets, res, len(pairs))
        np.testing.assert_array_equal(
            got, oracle.sw_scores_pairs(pairs, cfg), err_msg=str(cfg))


def test_engine_routes_long_pairs_to_strip_kernel():
    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine as _E

    rng = np.random.default_rng(10)
    long_sx = rng.choice(list(b"ATGC"), 200).astype(np.uint8).tobytes()
    long_sy = rng.choice(list(b"ATGC"), 230).astype(np.uint8).tobytes()
    short = SWPair(sx=b"ACGTAC", sy=b"ACGTACGT")
    pairs = [short, SWPair(sx=long_sx, sy=long_sy), short]
    e = _E(EngineConfig(backend="pallas", max_device_len=128), interpret=True)
    got = e.sw_scores(pairs)
    assert e.last_stats.offloaded_jobs == 1
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_pairhmm_long_strip_kernel_interpret():
    """The strip-mined long-read PairHMM kernel (HBM halo FIFO + cross-
    strip exponent reconciliation) vs the fp64 oracle: ragged jobs
    spanning several strips, a max-likelihood identical pair, and a
    deep all-mismatch pair whose rescales cross strip boundaries."""
    from genomax.io.formats import PairHMMRead
    from genomax.kernels.pairhmm_long import pairhmm_long

    rng = np.random.default_rng(11)
    abc = np.frombuffer(b"ACGT", np.uint8)

    def mk(L, q=35, bases=None):
        b = bases if bases is not None else rng.choice(abc, L).tobytes()
        qs = bytes([q] * L)
        return PairHMMRead(bases=b, base_q=qs, ins_q=qs, del_q=qs, gcp_q=qs)

    jobs = []
    for L, H in [(60, 70), (55, 40), (30, 100)]:
        jobs.append((mk(L), rng.choice(abc, H).tobytes()))
    b = rng.choice(abc, 64).tobytes()
    jobs.append((mk(64, bases=b), b))
    jobs.append((mk(64, q=40, bases=b"A" * 64), b"C" * 72))  # deep, rescaling

    got = pairhmm_long(jobs, strip_w=24, unroll=8, interpret=True)
    for i, (rd, h) in enumerate(jobs):
        want = oracle.pairhmm_log10(
            rd.bases, rd.base_q, rd.ins_q, rd.del_q, rd.gcp_q, h)
        np.testing.assert_allclose(got[i], want, atol=2e-4,
                                   err_msg=f"job {i}")


def test_engine_routes_long_reads_to_strip_kernel():
    """Oversized reads route to the on-device long-read kernel on the
    pallas backend (native fp64 only for chromosome-scale / failures),
    and the deep-negative fallback still applies to device results."""
    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine as _E
    from genomax.io.formats import PairHMMBatch, PairHMMRead

    rng = np.random.default_rng(13)
    abc = np.frombuffer(b"ACGT", np.uint8)
    L = 80
    q = bytes([35] * L)
    long_rd = PairHMMRead(bases=rng.choice(abc, L).tobytes(), base_q=q,
                          ins_q=q, del_q=q, gcp_q=q)
    qs = bytes([35] * 12)
    small_rd = PairHMMRead(bases=rng.choice(abc, 12).tobytes(), base_q=qs,
                           ins_q=qs, del_q=qs, gcp_q=qs)
    batch = PairHMMBatch(reads=[small_rd, long_rd],
                         haplotypes=[rng.choice(abc, 40).tobytes()])
    # max_device_len=64 -> the 80bp read is "oversized" and must ride
    # the long kernel (fallback disabled so the device value is what we
    # check; it is shallow enough to be exact).
    e = _E(EngineConfig(backend="pallas", max_device_len=64,
                        phmm_fallback_threshold=None), interpret=True)
    got = e.pairhmm([batch])
    assert e.last_stats.offloaded_jobs == 1
    want = oracle.pairhmm_batch_log10(batch)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sw_conveyor_kernel_interpret():
    """The conveyor kernel (pairs chained through the sublane window
    with period T) vs the oracle: ragged queues, tandem/identical/
    all-mismatch adversaries, tiny pairs, non-default scoring. NOT
    routed by the engine (measured slower than the resident kernel at
    every length it targets — DESIGN.md §4), but kept correct."""
    from genomax.config import SWConfig
    from genomax.kernels.sw_conveyor import sw_scores_conveyor

    rng = np.random.default_rng(3)
    abc = np.frombuffer(b"ATGC", np.uint8)

    def mk(lo, hi):
        a = rng.choice(abc, int(rng.integers(lo, hi))).tobytes() + b"\n"
        b = rng.choice(abc, int(rng.integers(lo, hi))).tobytes() + b"\n"
        return SWPair(sx=a, sy=b) if len(a) <= len(b) else SWPair(sx=b, sy=a)

    pairs = [mk(30, 50) for _ in range(40)]
    x = rng.choice(abc, 30).tobytes()
    pairs[3] = SWPair(sx=x, sy=x + b"TT" + x[:12])
    pairs[11] = SWPair(sx=b"A" * 30, sy=b"T" * 40)
    s = rng.choice(abc, 40).tobytes()
    pairs[22] = SWPair(sx=s, sy=s)
    pairs[33] = SWPair(sx=b"A", sy=b"ACGT")
    got = sw_scores_conveyor(pairs, max_slots=3, interpret=True)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))

    cfg = SWConfig(match=2, mismatch=-3, gap_open=0, gap_extend=-1)
    got2 = sw_scores_conveyor(pairs, cfg=cfg, max_slots=2, interpret=True)
    np.testing.assert_array_equal(got2, oracle.sw_scores_pairs(pairs, cfg))


def test_sw_rotor_kernel_interpret():
    """The column-stationary rotor kernel (kernels/sw_rotor.py) vs the
    oracle: ragged queues, identical/all-mismatch/tiny pairs, both
    unrolls, non-default scoring, and two directed adversaries against
    its moving wrap-row boundary — (a) queue-leak: a maximum-scoring
    pair directly ahead of an all-mismatch pair in the same lane queue
    (any P/Q/D chain crossing the r=0 slot scores a false positive;
    the all-mismatch score must be exactly 0), (b) period-edge pairs
    at nx = ny = T-1 stressing the fixed row-T-1 column pins."""
    from genomax.config import SWConfig
    from genomax.kernels.sw_rotor import sw_scores_rotor

    rng = np.random.default_rng(7)
    abc = np.frombuffer(b"ATGC", np.uint8)

    def mk(lo, hi):
        a = rng.choice(abc, int(rng.integers(lo, hi))).tobytes() + b"\n"
        b = rng.choice(abc, int(rng.integers(lo, hi))).tobytes() + b"\n"
        return SWPair(sx=a, sy=b)

    pairs = [mk(3, 60) for _ in range(40)]
    s = rng.choice(abc, 50).tobytes()
    pairs[5] = SWPair(sx=s, sy=s)
    pairs[9] = SWPair(sx=b"A" * 30, sy=b"T" * 55)
    pairs[13] = SWPair(sx=b"A", sy=b"ACGT")
    got = sw_scores_rotor(pairs, max_slots=3, interpret=True)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))

    cfg = SWConfig(match=2, mismatch=-3, gap_open=0, gap_extend=-1)
    got2 = sw_scores_rotor(pairs, cfg=cfg, max_slots=2, unroll=16,
                           interpret=True)
    np.testing.assert_array_equal(got2, oracle.sw_scores_pairs(pairs, cfg))

    # directed wrap-row adversaries (period T = 64 here)
    leak = []
    g = rng.choice(abc, 63).tobytes()
    for _ in range(16):
        leak.append(SWPair(sx=g, sy=g))
        leak.append(SWPair(sx=b"A" * 63, sy=b"T" * 63))
    leak = leak * 9  # 288 pairs -> multi-slot queues (P=3)
    got3 = sw_scores_rotor(leak, max_slots=4, interpret=True)
    np.testing.assert_array_equal(got3, oracle.sw_scores_pairs(leak))
    assert (got3[1::2] == 0).all()


def test_sw_rotor_engine_routing():
    """The engine routes short square-ish buckets through the rotor
    (differentially correct end-to-end incl. the bucket re-packer and
    the p8->P output compaction), and the geometry gate declines
    ragged short-x/long-y buckets where the resident kernel's smaller
    window wins (1.5*T^2 vs nxs*nd model, measured r5)."""
    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine
    from genomax.kernels.sw_rotor import maybe_prep_rotor
    from genomax.pack.bucketing import pack_sw_pairs

    rng = np.random.default_rng(11)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = [
        SWPair(sx=rng.choice(abc, int(rng.integers(3, 90))).tobytes()
               + b"\n",
               sy=rng.choice(abc, int(rng.integers(3, 90))).tobytes()
               + b"\n")
        for _ in range(300)
    ]
    cfg = EngineConfig(backend="pallas")
    buckets = pack_sw_pairs(pairs)
    assert any(maybe_prep_rotor(cfg, b) is not None for b in buckets)
    e = Engine(cfg, interpret=True)
    got = e.sw_scores(pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))

    ragged = [SWPair(sx=b"ACGT" * 10 + b"\n",
                     sy=rng.choice(abc, 120).tobytes() + b"\n")
              for _ in range(8)]
    for b in pack_sw_pairs(ragged):
        assert maybe_prep_rotor(cfg, b) is None
    # sw_stack opt-in bypasses the rotor (the stacked path stays
    # reachable for its differential tests)
    scfg = EngineConfig(backend="pallas", sw_stack=2)
    for b in buckets:
        assert maybe_prep_rotor(scfg, b) is None


def test_sw_stacked_kernel_interpret():
    """The sublane-stacked short-pair kernel vs the oracle: random
    ragged pairs across multiple stacked tiles, plus the ghost-read
    adversary — region 1's x IDENTICAL to region 0's stream, so any
    leak of the neighbor's codes through the shared window load would
    score a full-strength false alignment (the window mask must force
    those rows to pad)."""
    from genomax.kernels.sw_stacked import run_bucket_stacked
    from genomax.pack.bucketing import pack_sw_pairs, unpack_scores

    rng = np.random.default_rng(44)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(260):  # > 2 tiles so stack=2 really interleaves
        a = rng.choice(abc, int(rng.integers(3, 60))).tobytes()
        b = rng.choice(abc, int(rng.integers(3, 64))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    # ghost-read adversaries: x matches the OTHER stacked region's
    # stream exactly; its own stream is all-mismatch (score must be 0
    # against its own stream; any neighbor leak scores ~len(x)).
    ghost_y = rng.choice(abc, 60).tobytes()
    pairs.append(SWPair(sx=b"A" * 50, sy=ghost_y))
    pairs.append(SWPair(sx=ghost_y, sy=b"T" * 60))
    # tandem/wrap adversaries for the region-boundary pins
    s = rng.choice(abc, 55).tobytes()
    pairs.append(SWPair(sx=s, sy=s))
    pairs.append(SWPair(sx=b"A", sy=b"A"))

    for stack in (2, 4):
        buckets = pack_sw_pairs(pairs)
        res = []
        for b in buckets:
            r = run_bucket_stacked(b, stack=stack, unroll=8, interpret=True)
            res.append(np.asarray(r))
        got = unpack_scores(buckets, res, len(pairs))
        np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_sw_stacked_scoring_configs():
    from genomax.config import SWConfig
    from genomax.kernels.sw_stacked import run_bucket_stacked
    from genomax.pack.bucketing import pack_sw_pairs, unpack_scores

    rng = np.random.default_rng(45)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(130):
        a = rng.choice(abc, int(rng.integers(20, 60))).tobytes()
        b = rng.choice(abc, int(rng.integers(20, 64))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    for cfg in (SWConfig(match=2, mismatch=-3, gap_open=0, gap_extend=-1),
                SWConfig(match=3, mismatch=-1, gap_open=-5, gap_extend=-2)):
        buckets = pack_sw_pairs(pairs)
        res = [np.asarray(run_bucket_stacked(b, stack=2, cfg=cfg, unroll=8,
                                             interpret=True))
               for b in buckets]
        got = unpack_scores(buckets, res, len(pairs))
        np.testing.assert_array_equal(
            got, oracle.sw_scores_pairs(pairs, cfg))


def test_sw_stacked_ineligible_long_stream():
    """Streams longer than one region must be rejected (their codes
    would collide with the neighbor's buffer region)."""
    from genomax.kernels.sw_stacked import prep_bucket_stacked
    from genomax.pack.bucketing import pack_sw_pairs

    rng = np.random.default_rng(46)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = [SWPair(sx=rng.choice(abc, 40).tobytes(),
                    sy=rng.choice(abc, 300).tobytes())
             for _ in range(4)]
    b = pack_sw_pairs(pairs)[0]
    assert prep_bucket_stacked(b, 2) is None


def test_sw_stacked_ghost_read_directed():
    """Directed ghost-read adversary: 256 equal-shape pairs so the
    stable sort keeps packing order and stack=2 puts pair l and pair
    128+l in adjacent regions of the SAME lane; every region-1 x is
    region-0's stream verbatim. Scores must equal the oracle (region 1
    is all-mismatch vs its OWN stream -> 0)."""
    from genomax.kernels.sw_stacked import run_bucket_stacked
    from genomax.pack.bucketing import pack_sw_pairs, unpack_scores

    rng = np.random.default_rng(47)
    abc = np.frombuffer(b"ATGC", np.uint8)
    region0 = [SWPair(sx=b"A" * 50, sy=rng.choice(abc[1:], 54).tobytes())
               for _ in range(128)]  # sy has no 'A': region0 scores 0 too
    region1 = [SWPair(sx=p.sy[:50], sy=b"A" * 54) for p in region0]
    pairs = region0 + region1
    buckets = pack_sw_pairs(pairs)
    assert len(buckets) == 1 and buckets[0].sx.shape[0] == 2
    res = [np.asarray(run_bucket_stacked(b, stack=2, unroll=8,
                                         interpret=True))
           for b in buckets]
    got = unpack_scores(buckets, res, len(pairs))
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))
    assert got.max() == 0  # every pair is all-mismatch vs its own stream


def test_engine_stacked_routing_interpret():
    """cfg.sw_stack routes short buckets through the stacked kernel in
    the engine (interpret mode) with results equal to the oracle and to
    the default routing."""
    rng = np.random.default_rng(48)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(150):
        a = rng.choice(abc, int(rng.integers(3, 60))).tobytes()
        b = rng.choice(abc, int(rng.integers(3, 64))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    e2 = Engine(EngineConfig(backend="pallas", sw_stack=4), interpret=True)
    got = e2.sw_scores(pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_sw_stacked_rejects_window_past_anchor():
    """h > a0 would make the q=0 stream copy wrap to a negative slice
    start and silently mis-stack; public entry points must reject the
    hand-built bucket loudly (ADVICE r3). Unreachable via pack_sw_pairs
    (the anchor is STREAM_CHUNK-quantized >= nx)."""
    import dataclasses

    import pytest

    from genomax.kernels.sw_stacked import prep_bucket_stacked
    from genomax.pack.bucketing import pack_sw_pairs

    rng = np.random.default_rng(47)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = [SWPair(sx=rng.choice(abc, 40).tobytes(),
                    sy=rng.choice(abc, 30).tobytes())
             for _ in range(256)]
    b = pack_sw_pairs(pairs)[0]
    bad = dataclasses.replace(b, sy=b.sy[:, : b.sx.shape[1] - 1, :])
    with pytest.raises(ValueError, match="stream anchor"):
        prep_bucket_stacked(bad, 2)


def test_expand_byte_quals_rejects_offset_below_one():
    """phred_offset < 1 breaks the byte-0 pad sentinel (lut[0] would be
    1.0, so pads stop decaying and legit qual 0 marks cells dead)."""
    import pytest

    import jax.numpy as jnp

    from genomax.kernels.pairhmm_pallas import expand_byte_quals

    qb = np.zeros((1, 4, 8, 128), np.int8)
    with pytest.raises(ValueError, match="pad"):
        expand_byte_quals(jnp.asarray(qb), phred_offset=0.0)


