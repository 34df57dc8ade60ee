"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline = Smith-Waterman GCUPS on the reference's own benchmark point:
25,000 alignments of ~512bp random DNA (project_presentation.pptx slides
9-11: "50k sequences aligned pairwise" at LEN=512, best GPU time 110.10 ms
= ~59.5 GCUPS; see BASELINE.md). vs_baseline is measured against that
derived reference-GPU throughput — the strongest baseline the reference
publishes. Timing is sustained throughput: several back-to-back batch
dispatches fenced once (a production engine pipelines batches; per-call
host/tunnel latency is not kernel time). Secondary results (PairHMM on
the repo's 10s.in test set, parity checks) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_GPU_GCUPS_512 = 59.5  # BASELINE.md: 25k x 512^2 cells / 110.10 ms
REF_C_GCUPS = 0.047  # single-core C reference measured in BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import genomax

    genomax.setup_compilation_cache()
    import jax.numpy as jnp

    from genomax.io.formats import SWPair, parse_pairhmm_file
    from genomax.io.generator import random_dna
    from genomax.kernels import oracle
    from genomax.kernels.sw_pallas import sw_forward_pallas
    from genomax.pack.bucketing import pack_sw_pairs

    # ---- SW headline: 25,000 x LEN=512, measured as the per-25k time
    # inside a 4x-larger single-dispatch pipeline (the tunneled-TPU
    # environment adds ~26 ms fixed cost per dispatch that a local
    # runtime does not have; the reference's 110.10 ms is equally
    # launch-overhead-free kernel-only timing, hipvers.cpp:475-483) ----
    # GENOMAX_BENCH_TINY=1 shrinks everything so CI can execute the full
    # driver contract (incl. the JSON line) on CPU in seconds.
    tiny = os.environ.get("GENOMAX_BENCH_TINY", "").lower() not in ("", "0", "false", "no")
    import jax

    interp = tiny and jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    n, L, reps = (128, 32, 1) if tiny else (25000, 512, 4)
    pairs = [
        SWPair(sx=random_dna(rng, L) + b"\n", sy=random_dna(rng, L) + b"\n")
        for _ in range(n * reps)
    ]
    unroll = 32
    t0 = time.time()
    bucket = pack_sw_pairs(pairs)[0]
    log(f"pack: {time.time()-t0:.2f}s tiles={bucket.sx.shape}")

    # Strip-mined kernel (sweeps only live diagonals; 135-160 vs 62.9
    # GCUPS at this point, kernels/sw_strips.py) with the resident
    # kernel as fallback for tiny buckets — the same routing predicate
    # the engine uses. Arrays are placed on device once; timing is
    # kernel-only like the reference's (hipvers.cpp:475-483).
    from genomax.config import EngineConfig
    from genomax.kernels.sw_strips import (
        maybe_prep_strips,
        sw_forward_pallas_strips,
    )

    prep = maybe_prep_strips(EngineConfig(), bucket)
    if prep is not None:
        (sxs, sys_, ndt, nyt), statics = prep
        dev = [jnp.asarray(x) for x in (sxs, sys_, ndt, nyt)]

        def run():
            return sw_forward_pallas_strips(
                *dev, unroll=unroll, interpret=interp, **statics
            )
    else:
        args = [jnp.asarray(x)
                for x in (bucket.sx, bucket.sy, bucket.ndiag_tile)]

        def run():
            return sw_forward_pallas(*args, unroll=unroll, interpret=interp)

    t0 = time.time()
    try:
        res = np.asarray(run())
    except Exception as e:
        # Stale persistent-cache executables after a TPU runtime restart
        # fail with FAILED_PRECONDITION at dispatch; purge + recompile
        # (same signature-gated self-heal as engine/_run_buckets).
        from genomax.engine.executor import (
            _cache_suspect,
            _purge_compilation_cache,
        )

        if _cache_suspect(e):
            log(f"first dispatch failed ({e!r}); purging cache, retrying")
            _purge_compilation_cache()
            res = np.asarray(run())
        else:
            raise
    log(f"compile+first: {time.time()-t0:.1f}s")
    got = np.zeros(n * reps, np.int32)
    got[bucket.perm] = res.reshape(-1)[: bucket.n_valid]
    ok = np.array_equal(got[:4], oracle.sw_scores_pairs(pairs[:4]))
    log(f"parity spot-check: {'OK' if ok else 'MISMATCH'}")

    # Sustained kernel-only throughput via SLOPE timing: the marginal
    # cost of extra back-to-back dispatches, t(k) = F + k*K. The fixed
    # F (~32 ms here: 25 ms tunnel dispatch + result D2H at ~58 MB/s)
    # is pure harness cost on this axon-tunneled host — a local TPU
    # host pays ~0.1 ms — and the linear model was validated against
    # the device-serial alternative out to k=64 dispatches
    # (genomax/bench/sweep.py bench_sw_point docstring). The
    # reference's numbers are equally kernel-only, launch+sync around
    # the kernel (hipvers.cpp:475-483).
    def fenced(k):
        best = float("inf")
        for _ in range(2 if tiny else 5):
            t0 = time.time()
            for _ in range(k - 1):
                run()
            np.asarray(run())  # in-order stream: fences the whole chain
            best = min(best, time.time() - t0)
        return best

    t1, t3 = fenced(1), fenced(3)
    per = (t3 - t1) / 2
    if per <= 0:  # timer noise floor (tiny/interpret mode)
        per = t1
    cells = n * reps * (L + 1) ** 2
    gcups = cells / per / 1e9
    log(f"SW {n*reps} x {L}: {per*1e3:.1f} ms/dispatch kernel-only "
        f"(slope; single fenced dispatch {t1*1e3:.1f} ms) = {gcups:.2f} "
        f"GCUPS (ref GPU best {REF_GPU_GCUPS_512} GCUPS / 110.10 ms; "
        f"ref C {REF_C_GCUPS} GCUPS)")

    # ---- secondary: PairHMM parity (10s.in) + production-scale GCUPS ----
    try:
        from genomax.engine.executor import Engine
        from genomax.config import EngineConfig

        golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tests", "golden")
        # tiny mode: the compiled lax twin (interpreting 3,550 pairs
        # would dominate CI time); kernels are covered by the headline.
        eng = Engine(EngineConfig(backend="lax" if tiny else "pallas"))
        batches = parse_pairhmm_file(os.path.join(golden, "10s.in"))
        v = eng.pairhmm(batches)  # compile + run
        t0 = time.time()
        v = eng.pairhmm(batches)
        dt = time.time() - t0
        want = np.loadtxt(os.path.join(golden, "10s.golden.out"))
        err = float(np.abs(np.asarray(v, np.float64) - want).max())
        log(f"PairHMM 10s.in: {dt*1e3:.0f} ms end-to-end, max|err|={err:.1e} "
            f"(ref C full-matrix: 590 ms)")

        # Production-scale throughput: GATK-like 151bp reads x 300bp haps.
        import jax.numpy as jnp2  # noqa: F401
        from genomax.io.generator import generate_pairhmm_batch
        from genomax.kernels.pairhmm_pallas import pairhmm_forward_pallas
        from genomax.pack.bucketing import pack_pairhmm_batches

        if tiny:
            raise RuntimeError("skip production-scale point in tiny mode")
        big = generate_pairhmm_batch(8192, 8, read_len=151, hap_len=300,
                                     seed=0)
        bks, _ = pack_pairhmm_batches([big])
        b = bks[0]
        dev = tuple(jnp.asarray(x) for x in (b.rchar, b.qr, b.mmv, b.gapm,
                                             b.qi, b.qd, b.qg, b.hap, b.meta,
                                             b.ndiag_tile))
        np.asarray(pairhmm_forward_pallas(*dev, interpret=interp))
        # kernel-only slope timing, same scheme as the SW headline
        def fenced_p(k):
            best = float("inf")
            for _ in range(4):
                t0 = time.time()
                for _ in range(k - 1):
                    pairhmm_forward_pallas(*dev, interpret=interp)
                np.asarray(pairhmm_forward_pallas(*dev, interpret=interp))
                best = min(best, time.time() - t0)
            return best

        tp1, tp9 = fenced_p(1), fenced_p(9)
        bestp = (tp9 - tp1) / 8
        if bestp <= 0:
            bestp = tp1
        pc = int((b.rl.astype(np.int64) * b.hl).sum())
        log(f"PairHMM 65536x151x300: {bestp*1e3:.0f} ms kernel-only "
            f"(slope) = {pc/bestp/1e9:.2f} GCUPS (ref C {0.106} GCUPS)")
    except Exception as e:  # secondary must not break the headline line
        log(f"PairHMM secondary failed: {e!r}")

    # ---- secondary: long-pair strip kernel (capability the reference
    # lacks entirely: it caps at MAX_LINE_LENGTH 1000) ----
    try:
        from genomax.kernels.sw_long import sw_scores_long

        rngl = np.random.default_rng(7)
        longn = 150 if tiny else 50_000
        s50 = rngl.choice(list(b"ATGC"), longn).astype(np.uint8).tobytes()
        lpairs = [SWPair(sx=s50, sy=s50)]
        got = sw_scores_long(lpairs, interpret=interp)  # compile + run
        t0 = time.time()
        sw_scores_long(lpairs, interpret=interp)
        dtl = time.time() - t0
        lc = 128 * longn * longn
        log(f"SW long 128x{longn}x{longn}: {dtl:.2f} s = {lc/dtl/1e9:.0f} G "
            f"lane-cells/s, identical-pair score {got[0]}/{longn} "
            f"(reference caps at 1kbp)")
    except Exception as e:
        log(f"SW long secondary failed: {e!r}")

    print(json.dumps({
        "metric": "SW affine-gap GCUPS, 25k x 512bp alignments (ref headline)",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / REF_GPU_GCUPS_512, 3),
    }))


if __name__ == "__main__":
    main()
