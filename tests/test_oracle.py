"""Numpy golden-model tests against vendored reference-binary outputs."""

import os

import numpy as np

from genomax.io.formats import parse_pairhmm_file, parse_sw_file
from genomax.kernels import oracle

G = os.path.join(os.path.dirname(__file__), "golden")


def _want_scores(name):
    with open(os.path.join(G, name)) as f:
        return np.array([int(l.split()[1]) for l in f], dtype=np.int32)


def test_sw_oracle_quirks():
    pairs = parse_sw_file(os.path.join(G, "sw_quirks.in"))
    np.testing.assert_array_equal(
        oracle.sw_scores_pairs(pairs), _want_scores("sw_quirks.golden.out")
    )


def test_sw_oracle_small():
    pairs = parse_sw_file(os.path.join(G, "sw_small.in"))
    np.testing.assert_array_equal(
        oracle.sw_scores_pairs(pairs), _want_scores("sw_small.golden.out")
    )


def test_pairhmm_oracle_test_in():
    batch = parse_pairhmm_file(os.path.join(G, "test.in"))[0]
    v = oracle.pairhmm_batch_log10(batch)
    want = float(open(os.path.join(G, "test.out")).read())
    # The vendored value is printed with %f (6 decimals).
    assert abs(v[0] - want) < 5e-7


def test_pairhmm_oracle_first_pairs_of_10s():
    # Full 10s.in through the python oracle is too slow; check the first
    # batch's first read against the vendored golden output.
    batches = parse_pairhmm_file(os.path.join(G, "10s.in"))
    b = batches[0]
    sub = type(b)(reads=b.reads[:1], haplotypes=b.haplotypes)
    v = oracle.pairhmm_batch_log10(sub)
    with open(os.path.join(G, "10s.golden.out")) as f:
        want = [float(next(f)) for _ in range(len(v))]
    np.testing.assert_allclose(v, want, atol=5e-7)
