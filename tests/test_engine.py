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
