"""I/O format parity tests, including the reference's parsing quirks."""

import os

import numpy as np

from genomax.io.formats import (
    SWPair,
    parse_pairhmm_file,
    parse_sw_file,
    write_sw_input,
)
from genomax.io.phred import phred_to_error_prob

G = os.path.join(os.path.dirname(__file__), "golden")


def test_sw_trailing_newline_kept():
    # Sequences keep the trailing '\n' exactly like strlen() over the raw
    # fgets line (antidiagonalSmithWaterman.c:229-243).
    pairs = parse_sw_file(os.path.join(G, "sw_quirks.in"))
    assert pairs[0].sx == b"AAAA\n"
    assert pairs[0].sy == b"TTTT\n"


def test_sw_swap_rule():
    # Shorter line becomes sx; ties keep line1 as sx.
    pairs = parse_sw_file(os.path.join(G, "sw_quirks.in"))
    assert pairs[1].sx == b"CG\n" and pairs[1].sy == b"CCGA\n"
    assert pairs[3].sx == b"A\n" and pairs[3].sy == b"GGGGGGGG\n"


def test_sw_header_counts_sequences(tmp_path):
    # Header counts consumed sequences: header=2 with 4 lines -> 1 pair.
    p = tmp_path / "h.in"
    p.write_bytes(b"2\nAA\nTT\nGG\nCC\n")
    pairs = parse_sw_file(str(p))
    assert len(pairs) == 1


def test_sw_roundtrip(tmp_path):
    p = tmp_path / "rt.in"
    write_sw_input(str(p), [b"ACGT", b"GGTT"])
    pairs = parse_sw_file(str(p))
    assert pairs == [SWPair(sx=b"ACGT\n", sy=b"GGTT\n")]


def test_pairhmm_parse_test_in():
    batches = parse_pairhmm_file(os.path.join(G, "test.in"))
    assert len(batches) == 1
    b = batches[0]
    assert len(b.reads) == 1 and len(b.haplotypes) == 1
    assert len(b.reads[0].bases) == 41
    assert len(b.reads[0].base_q) == 41
    assert b.haplotypes[0].startswith(b"CCCTTGCATTT")


def test_pairhmm_parse_10s_batches():
    batches = parse_pairhmm_file(os.path.join(G, "10s.in"))
    assert len(batches) == 7
    total = sum(len(b.reads) * len(b.haplotypes) for b in batches)
    assert total == 3550  # SURVEY.md: 7 batches, 3,550 pairs


def test_phred_decode():
    # Q = 10^(-(c-33)/10), pairHMMmatrix.c:20-30
    q = phred_to_error_prob(np.frombuffer(b"!+I", np.uint8))
    np.testing.assert_allclose(q, [1.0, 10**-1.0, 10**-4.0], rtol=1e-12)


def test_malformed_inputs_raise_clean_errors(tmp_path):
    import pytest

    from genomax.io.formats import parse_pairhmm_file, parse_sw_file

    p = tmp_path / "bad1.txt"
    p.write_text("not-a-number\nACGT\nACGT\n")
    with pytest.raises(ValueError, match="sequence count"):
        parse_sw_file(str(p))

    p = tmp_path / "bad2.txt"
    p.write_text("2 1\nACG III III III III\n")  # promises 2 reads, has 1
    with pytest.raises(ValueError, match="ends early"):
        parse_pairhmm_file(str(p))

    p = tmp_path / "bad3.txt"
    p.write_text("1 1\nACG III III\nACGT\n")  # 3 fields, want 5
    with pytest.raises(ValueError, match="5"):
        parse_pairhmm_file(str(p))

    p = tmp_path / "bad4.txt"
    p.write_text("x y\nACG III III III III\nACGT\n")
    with pytest.raises(ValueError, match="header"):
        parse_pairhmm_file(str(p))
