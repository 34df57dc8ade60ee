"""Streaming driver (engine/stream.py): chunked scoring with pack/
execute overlap must produce results identical to the one-shot engine,
including offload/fallback handling and aggregated stats."""

import numpy as np
import pytest

from genomax.config import EngineConfig
from genomax.engine.executor import Engine
from genomax.io.formats import SWPair
from genomax.io.generator import generate_pairhmm_batch
from genomax.kernels import oracle


def test_sw_stream_matches_oneshot():
    rng = np.random.default_rng(44)
    abc = np.frombuffer(b"ATGC", np.uint8)
    pairs = []
    for _ in range(90):
        a = rng.choice(abc, int(rng.integers(5, 60))).tobytes()
        b = rng.choice(abc, int(rng.integers(5, 60))).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    # an oversized pair inside a middle chunk exercises the per-chunk
    # offload post-pass
    pairs[40] = SWPair(
        sx=rng.choice(abc, 1100).tobytes(), sy=rng.choice(abc, 1200).tobytes()
    )
    eng = Engine(EngineConfig(backend="lax"))
    want = eng.sw_scores(pairs)
    got = eng.sw_scores_stream(pairs, chunk_pairs=32)
    np.testing.assert_array_equal(got, want)
    assert eng.last_stats.n_jobs == len(pairs)
    assert eng.last_stats.offloaded_jobs == 1
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_pairhmm_stream_matches_oneshot():
    from genomax import native

    batches = [
        generate_pairhmm_batch(2, 2, read_len=11 + i, hap_len=14 + i, seed=i)
        for i in range(5)
    ]
    eng = Engine(EngineConfig(backend="lax"))
    want = eng.pairhmm(batches)
    got = eng.pairhmm_stream(batches, chunk_batches=2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert eng.last_stats.n_jobs == sum(
        len(b.reads) * len(b.haplotypes) for b in batches
    )


def test_stream_rejects_nonpositive_chunk():
    """A negative/zero chunk silently produced all-zero results before
    (range(0, n, -5) -> no spans -> the empty-workload guard fired)."""
    import pytest

    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine
    from genomax.io.formats import SWPair

    eng = Engine(EngineConfig(backend="lax"))
    pairs = [SWPair(sx=b"ACG\n", sy=b"ACGT\n")]
    for bad in (0, -5):
        with pytest.raises(ValueError, match="chunk"):
            eng.sw_scores_stream(pairs, bad)
        with pytest.raises(ValueError, match="chunk"):
            eng.pairhmm_stream([], bad)
