"""Cross-chip wavefront (one DP matrix sharded over the mesh) vs the
full-matrix oracle, on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from genomax.dist.mesh import make_mesh
from genomax.dist.xsharded import pack_sw_xsharded, sw_forward_xsharded
from genomax.io.formats import SWPair
from genomax.kernels import oracle


@pytest.fixture(scope="module")
def mesh():
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = []
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices (see conftest XLA_FLAGS)")
    return make_mesh(8, devices=cpus)


def _run(mesh, pairs, unroll=16):
    import jax.numpy as jnp

    b = pack_sw_xsharded(pairs, mesh.devices.size, unroll=unroll)
    got = np.asarray(
        sw_forward_xsharded(
            jnp.asarray(b.sx),
            jnp.asarray(b.sy),
            mesh=mesh,
            strip_w=b.strip_w,
            n_diags=b.n_diags,
            unroll=b.unroll,
            anchor=b.anchor,
            interpret=True,  # CPU mesh: the Pallas inner runs interpreted
        )
    )
    return got[: b.n_valid]


def test_xsharded_matches_oracle(mesh):
    rng = np.random.default_rng(31)
    pairs = []
    for _ in range(16):
        a = rng.choice(list(b"ATGC"), int(rng.integers(150, 400))).astype(np.uint8).tobytes()
        b = rng.choice(list(b"ATGC"), int(rng.integers(150, 400))).astype(np.uint8).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    got = _run(mesh, pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_xsharded_identical_and_disjoint(mesh):
    # max-score and zero-score extremes cross every strip boundary
    s = np.random.default_rng(1).choice(list(b"ATGC"), 300).astype(np.uint8).tobytes()
    pairs = [SWPair(sx=s, sy=s), SWPair(sx=b"A" * 250, sy=b"T" * 350)]
    got = _run(mesh, pairs)
    np.testing.assert_array_equal(got, [300, 0])


def test_xsharded_ragged_tiny(mesh):
    pairs = [SWPair(sx=b"ACGT", sy=b"ACGTACGT"), SWPair(sx=b"A", sy=b"A")]
    got = _run(mesh, pairs, unroll=8)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_xsharded_small_unroll_anchor(mesh):
    # ADVICE r1: with unroll 1/2/4 the kernel's old anchor reconstruction
    # (ndt - (K-1)(w+U) - w) overshot the pack anchor whenever the pack's
    # final SUB_Q round-up moved — the anchor must come from the pack.
    rng = np.random.default_rng(77)
    pairs = []
    for _ in range(6):
        a = rng.choice(list(b"ATGC"), int(rng.integers(100, 260))).astype(np.uint8).tobytes()
        b = rng.choice(list(b"ATGC"), int(rng.integers(100, 260))).astype(np.uint8).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    for unroll in (1, 2, 4):
        got = _run(mesh, pairs, unroll=unroll)
        np.testing.assert_array_equal(
            got, oracle.sw_scores_pairs(pairs), err_msg=f"unroll={unroll}"
        )


def test_xsharded_large_unroll_fori(mesh):
    # U > SUB_U exercises the in-kernel fori sub-block path (dynamic
    # slab/halo row indexing); large U shrinks the per-block HBM
    # round-trip overhead on real hardware.
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(4):
        a = rng.choice(list(b"ATGC"), int(rng.integers(150, 300))).astype(np.uint8).tobytes()
        b = rng.choice(list(b"ATGC"), int(rng.integers(150, 300))).astype(np.uint8).tobytes()
        if len(a) > len(b):
            a, b = b, a
        pairs.append(SWPair(sx=a, sy=b))
    got = _run(mesh, pairs, unroll=64)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))


def test_xsharded_tandem_repeat(mesh):
    # wrap-around adversary (see test_wavefront._tandem_pairs): halo
    # injection must carry the true neighbor rows, and device 0's zero
    # inject must behave as the column boundary, not a wrap.
    rng = np.random.default_rng(5)
    x = rng.choice(list(b"ATGC"), 150).astype(np.uint8).tobytes()
    junk = rng.choice(list(b"ATGC"), 160).astype(np.uint8).tobytes()
    pairs = [SWPair(sx=x, sy=x + junk + x)]
    got = _run(mesh, pairs)
    np.testing.assert_array_equal(got, oracle.sw_scores_pairs(pairs))
