"""genomax — a TPU-native pairwise-alignment scoring engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference GPU project (Smith-Waterman affine-gap score-only alignment and
the PairHMM forward algorithm; see /root/reference README.md:2), re-designed
TPU-first:

  * anti-diagonal wavefront DP vectorized along VPU lanes, pair batches on
    sublanes, 3-diagonal rotation held in VMEM (Pallas kernels);
  * ragged inputs packed/bucketed into dense tiles;
  * multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` data
    parallelism with all-gathered scores;
  * a native C++ fp64 golden model + parser for differential testing
    (mirrors the role of the reference's C binaries).

Layout (SURVEY.md §7):
    io/       file formats, phred decode, input generator
    pack/     ragged-length bucketing and dense packing
    kernels/  Pallas TPU kernels + pure-JAX wavefront + numpy oracle
    engine/   per-chip executor (bucket dispatch, jit cache)
    dist/     device mesh, sharded scoring, collectives
    cli/      drop-in command line (sw / pairhmm / bench / parity)
    native/   C++ golden model and fast parser (ctypes)
"""

__version__ = "0.1.0"

from genomax.config import SWConfig, PairHMMConfig, EngineConfig  # noqa: F401

_CACHE_SET_UP = False


def honor_jax_platforms() -> None:
    """Mirror the JAX_PLATFORMS env var into jax.config (idempotent).

    The tunneled-TPU PJRT plugin self-registers via sitecustomize and
    (observed) initializes even when ``JAX_PLATFORMS=cpu`` is set — a
    down tunnel then hangs ``jax.devices()`` in what should be a
    CPU-only run (tests/conftest.py hit the same and works around it
    the same way). The config API is authoritative where the env var is
    not, so the CLI, bench.py and __graft_entry__ call this before
    touching any backend. No-op when the env var is unset."""
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except Exception:  # unknown platform string: keep jax's own error path
        pass


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    Mosaic kernel compiles cost 5-60s per shape bucket; the cache makes
    every repeat CLI/engine run hit warm executables (measured: 45s ->
    <1s compile on the second process). Called by the Engine, CLI and
    bench entry points; set GENOMAX_NO_CACHE=1 to opt out."""
    global _CACHE_SET_UP
    import os

    if _CACHE_SET_UP or os.environ.get("GENOMAX_NO_CACHE"):
        return
    _CACHE_SET_UP = True
    import jax

    # TPU executables only: under the remote-compile tunnel, XLA:CPU
    # results can be built with host-feature sets that differ from this
    # machine (loading those risks SIGILL), and CPU compiles are cheap.
    try:
        if jax.default_backend() != "tpu":
            return
    except Exception:
        return
    path = path or os.environ.get(
        "GENOMAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "genomax-jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax or read-only fs: run uncached
        pass


def __getattr__(name):
    # Lazy: keep `import genomax` light (Engine pulls in jax).
    if name == "Engine":
        from genomax.engine.executor import Engine

        return Engine
    raise AttributeError(name)
