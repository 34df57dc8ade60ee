"""Engine-level tests: golden parity, stats, fp64 fallback."""

import os

import numpy as np
import pytest

from genomax.config import EngineConfig
from genomax.engine.executor import Engine
from genomax.io.formats import parse_pairhmm_file, parse_sw_file
from genomax.io.generator import generate_pairhmm_batch

G = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def eng():
    return Engine(EngineConfig(backend="lax"))


def test_sw_goldens(eng):
    for name in ("sw_quirks", "sw_small"):
        got = eng.sw_scores(parse_sw_file(os.path.join(G, f"{name}.in")))
        want = np.array(
            [int(l.split()[1]) for l in open(os.path.join(G, f"{name}.golden.out"))]
        )
        np.testing.assert_array_equal(got, want)


def test_pairhmm_golden_test_in(eng):
    v = eng.pairhmm(parse_pairhmm_file(os.path.join(G, "test.in")))
    want = float(open(os.path.join(G, "test.out")).read())
    assert abs(v[0] - want) < 1e-4
    assert eng.last_stats.n_jobs == 1


def test_stats_populated(eng):
    eng.pairhmm(parse_pairhmm_file(os.path.join(G, "test.in")))
    s = eng.last_stats.as_dict()
    assert s["dp_cells"] == 41 * 41
    assert s["buckets"] == 1
    assert s["exec_s"] > 0


def test_fallback_exact_for_out_of_range_pairs():
    from genomax import native

    if not native.available():
        pytest.skip("native golden unavailable")
    eng = Engine(EngineConfig(backend="lax"))
    # unrelated read/hap: true log10 likelihood far below the fp32 design
    # range; the engine must hand these to the fp64 golden model.
    batch = generate_pairhmm_batch(1, 1, read_len=120, hap_len=130, seed=99)
    got = eng.pairhmm([batch])
    want = native.pairhmm_native([batch])
    assert want[0] < -100
    assert eng.last_stats.fallback_jobs == 1
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_oversized_pairs_offload_to_native():
    """Pairs too big for VMEM run through the native exact model — the
    reference supports up to MAX_LINE_LENGTH 1000 sequences; we go far beyond."""
    from genomax import native
    from genomax.io.formats import SWPair

    if not native.available():
        pytest.skip("native golden unavailable")
    rng = np.random.default_rng(5)
    long_a = rng.choice(list(b"ATGC"), size=3000).astype(np.uint8).tobytes()
    long_b = rng.choice(list(b"ATGC"), size=3100).astype(np.uint8).tobytes()
    short = [
        SWPair(sx=rng.choice(list(b"ATGC"), 20).astype(np.uint8).tobytes(),
               sy=rng.choice(list(b"ATGC"), 25).astype(np.uint8).tobytes())
        for _ in range(3)
    ]
    pairs = [short[0], SWPair(sx=long_a, sy=long_b), short[1], short[2]]
    eng = Engine(EngineConfig(backend="lax"))
    got = eng.sw_scores(pairs)
    assert eng.last_stats.offloaded_jobs == 1
    want = native.sw_scores_native(pairs)
    np.testing.assert_array_equal(got, want)


def test_oversized_pairhmm_offload():
    from genomax import native
    from genomax.io.generator import generate_pairhmm_batch
    from genomax.kernels import oracle

    if not native.available():
        pytest.skip("native golden unavailable")
    big = generate_pairhmm_batch(1, 1, read_len=1200, hap_len=1300, seed=6)
    small = generate_pairhmm_batch(2, 1, read_len=12, hap_len=15, seed=7)
    eng = Engine(EngineConfig(backend="lax"))
    got = eng.pairhmm([small, big])
    assert eng.last_stats.offloaded_jobs == 1
    want_small = oracle.pairhmm_batch_log10(small)
    np.testing.assert_allclose(got[:2], want_small, atol=2e-4)
    want_big = native.pairhmm_native([big])
    np.testing.assert_allclose(got[2], want_big[0], atol=1e-9)


def test_compilation_cache_config_wiring(monkeypatch, tmp_path):
    """setup_compilation_cache wires the persistent cache dir + min
    compile time on a TPU backend (mocked here; the cross-process warm
    hit is verified on hardware — PERF.md "Compile latency": 317 s cold
    -> 16.8 s in a second process on the same fresh cache dir)."""
    import genomax
    import jax

    monkeypatch.setattr(genomax, "_CACHE_SET_UP", False)
    monkeypatch.setenv("GENOMAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("GENOMAX_NO_CACHE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    old = jax.config.jax_compilation_cache_dir
    try:
        genomax.setup_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        monkeypatch.setattr(genomax, "_CACHE_SET_UP", False)


def test_purge_compilation_cache_removes_dir(monkeypatch, tmp_path):
    """_run_buckets' retry self-heal: the purge drops the on-disk cache
    (stale executables after a TPU runtime restart fail with
    FAILED_PRECONDITION at dispatch)."""
    import jax

    from genomax.engine.executor import _purge_compilation_cache

    d = tmp_path / "cache"
    d.mkdir()
    (d / "entry").write_text("x")
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(d))
    try:
        _purge_compilation_cache()
        assert not d.exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_strips_vmem_gate_short_x_long_y():
    """Short-x/long-y buckets can pass the stream_vmem_rows gate while
    the strips kernel's diagonal-indexed halo buffers (~anchor rows x4)
    would blow VMEM; maybe_prep_strips must reject them so the engine
    falls back to the resident kernel (round-2 self-review finding)."""
    from genomax.io.formats import SWPair
    from genomax.io.generator import random_dna
    from genomax.kernels.sw_strips import maybe_prep_strips
    from genomax.pack.bucketing import pack_sw_pairs

    rng = np.random.default_rng(5)
    pairs = [SWPair(sx=random_dna(rng, 250), sy=random_dna(rng, 5300))
             for _ in range(4)]
    b = pack_sw_pairs(pairs)[0]
    cfg = EngineConfig()
    assert b.sy.shape[1] <= cfg.stream_vmem_rows  # passes the old gate
    assert b.sx.shape[1] >= cfg.strips_min_nxs
    assert maybe_prep_strips(cfg, b) is None  # but not the VMEM budget
    # and a mid-size bucket still routes to strips
    pairs2 = [SWPair(sx=random_dna(rng, 500), sy=random_dna(rng, 500))
              for _ in range(4)]
    b2 = pack_sw_pairs(pairs2)[0]
    assert maybe_prep_strips(cfg, b2) is not None


def test_pairhmm_out_of_range_quals_rejected():
    """Quality bytes below the phred offset (decode to error prob > 1)
    or above 127 (wrap negative through the reference's signed char)
    must be rejected loudly at pack time: the byte-shipping device path
    and the fp32-table path would otherwise decode them differently and
    silently diverge (round-3 self-review finding)."""
    from genomax.io.formats import PairHMMBatch, PairHMMRead
    from genomax.pack.bucketing import pack_pairhmm_batches

    def batch(q):
        rd = PairHMMRead(bases=b"ACGT", base_q=q, ins_q=b"IIII",
                         del_q=b"IIII", gcp_q=b"++++")
        return PairHMMBatch(reads=[rd], haplotypes=[b"ACGTA"])

    for bad in (b"I\x20II", b"II\xffI"):
        with pytest.raises(ValueError, match="quality byte out of range"):
            pack_pairhmm_batches([batch(bad)])
    for bad in (b"I\x20II", b"II\xffI"):
        with pytest.raises(ValueError, match="quality byte out of range"):
            pack_pairhmm_batches([batch(bad)], factored=True)
    # boundary values are legal
    pack_pairhmm_batches([batch(b"!!\x7f!")])


def test_device_offload_failure_warns_and_reroutes(monkeypatch, capsys):
    """A long-pair device-kernel failure must (a) still return exact
    results via the native fp64 reroute and (b) leave a trace on stderr
    (VERDICT r3 weak #3: a compile regression silently turning a ~1 s
    TPU dispatch into minutes of CPU is the reference's unchecked
    d_error anti-pattern)."""
    from genomax import native
    from genomax.engine.executor import RunStats
    from genomax.io.formats import SWPair
    from genomax.kernels import sw_long as swl

    if not native.available():
        pytest.skip("native golden unavailable")
    eng = Engine(EngineConfig(backend="pallas"))  # device path w/o dispatch

    def boom(*a, **k):
        raise RuntimeError("forced device failure")

    monkeypatch.setattr(swl, "sw_scores_long", boom)
    rng = np.random.default_rng(11)
    pair = SWPair(sx=rng.choice(list(b"ATGC"), 2000).astype(np.uint8).tobytes(),
                  sy=rng.choice(list(b"ATGC"), 2100).astype(np.uint8).tobytes())
    out = np.zeros(1, np.int32)
    eng._sw_offload_post([pair], out, np.array([True]), RunStats())
    err = capsys.readouterr().err
    assert "long-pair SW device kernel failed" in err
    assert "rerouting 1 pairs" in err
    np.testing.assert_array_equal(out, native.sw_scores_native([pair]))


def test_pairhmm_offload_failure_warns_and_reroutes(monkeypatch, capsys):
    from genomax import native
    from genomax.engine.executor import RunStats
    from genomax.kernels import pairhmm_long as phl

    if not native.available():
        pytest.skip("native golden unavailable")
    eng = Engine(EngineConfig(backend="pallas"))

    def boom(*a, **k):
        raise RuntimeError("forced device failure")

    monkeypatch.setattr(phl, "pairhmm_long", boom)
    big = generate_pairhmm_batch(1, 1, read_len=60, hap_len=70, seed=3)
    out = np.zeros(1, np.float32)
    out2, native_done = eng._phmm_offload_post(
        [big], out, np.array([True]), RunStats())
    err = capsys.readouterr().err
    assert "long-read PairHMM device kernel failed" in err
    assert native_done is not None and native_done[0]
    np.testing.assert_allclose(out2, native.pairhmm_native([big]), atol=1e-9)
