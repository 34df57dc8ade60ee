"""Benchmark sweep — the TPU analogue of the reference's hiprun.sh
block-size sweep (smithWaterman/hiprun.sh:18-39: lengths {64..1024} ×
block sizes {32..1024}, 25,000 alignments per point; results charted in
project_presentation.pptx slides 10-14, tabulated in BASELINE.md). The
TPU tuning knob is the wavefront unroll factor (steps per fori_loop
iteration) — tiles are always 128 pairs wide (the VPU lane width)."""

from __future__ import annotations

import json
import time

import numpy as np


def _force(x):
    # On tunneled platforms block_until_ready can return early; a host
    # copy is the only reliable fence.
    return np.asarray(x)


def bench_sw_point(length: int, num_alignments: int, unroll: int, backend: str,
                   trials: int = 3, seed: int = 0):
    """One sweep point: fixed-length random pairs, kernel-only SLOPE
    timing (matches the reference's kernel-only elapsed,
    hipvers.cpp:475-483). The marginal cost of extra back-to-back
    dispatches isolates device time from this host's fixed per-dispatch
    tunnel cost (~25 ms) and the result D2H: at 64bp the kernel runs
    ~1.2 ms per 25k pairs, so a single fenced dispatch measures mostly
    overhead (21.5 "GCUPS" where the kernel does ~95 — the linear
    t(k) = F + k*K model was validated out to k=64 against the
    device-serial alternative, which would have doubled t32 vs t16).
    The reference's numbers are equally launch-free kernel-only
    timing; a non-tunneled TPU host pays ~0.1 ms, not 25."""
    import jax.numpy as jnp

    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine, _sw_dense_jit
    from genomax.io.formats import SWPair
    from genomax.io.generator import random_dna
    from genomax.pack.bucketing import pack_sw_pairs

    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(num_alignments):
        a = random_dna(rng, length) + b"\n"
        b = random_dna(rng, length) + b"\n"
        pairs.append(SWPair(sx=a, sy=b))

    eng = Engine(EngineConfig(backend=backend))
    buckets = pack_sw_pairs(pairs)
    # Pre-place on device; time kernels only.
    runs = []
    for b in buckets:
        if eng.backend == "pallas":
            from genomax.kernels.sw_pallas import sw_forward_pallas
            from genomax.kernels.sw_strips import (
                maybe_prep_strips,
                sw_forward_pallas_strips,
            )

            # Same routing as the engine: strips (shared predicate),
            # else streamed for big stream buffers, else resident —
            # mirroring Engine._sw_bucket so every published point
            # measures the kernel production actually runs. (Lengths
            # past cfg.max_device_len would be OFFLOADED to sw_long by
            # the engine; note it rather than silently publishing a
            # phantom path.)
            if length + 1 > eng.cfg.max_device_len:
                print(f"  note: LEN={length} exceeds max_device_len="
                      f"{eng.cfg.max_device_len}; the engine routes such "
                      "pairs to sw_long — this point times the raw "
                      "kernel")
            prep = maybe_prep_strips(eng.cfg, b)
            if prep is not None:
                (sxs, sys_, ndt, nyt), statics = prep
                dev = tuple(jnp.asarray(x) for x in (sxs, sys_, ndt, nyt))
                runs.append(
                    lambda a=dev, s=statics: sw_forward_pallas_strips(
                        *a, unroll=unroll, **s)
                )
                continue
            from genomax.kernels.sw_rotor import (
                maybe_prep_rotor,
                sw_forward_pallas_rotor_bucket,
            )

            rprep = maybe_prep_rotor(eng.cfg, b)
            if rprep is not None:
                (xrev, ybuf), statics = rprep
                dev = (jnp.asarray(xrev), jnp.asarray(ybuf))
                # the rotor picks its own unroll (a divisor of the
                # period); the sweep's unroll knob does not apply
                runs.append(
                    lambda a=dev, s=statics:
                    sw_forward_pallas_rotor_bucket(*a, **s)
                )
                continue
            from genomax.kernels.sw_pallas import sw_forward_pallas_streamed

            fn = (sw_forward_pallas_streamed
                  if b.sy.shape[1] > eng.cfg.stream_vmem_rows
                  else sw_forward_pallas)
            args = (
                jnp.asarray(b.sx),
                jnp.asarray(b.sy),
                jnp.asarray(b.ndiag_tile),
            )
            runs.append(lambda a=args, f=fn: f(*a, unroll=unroll))
        else:
            from genomax.engine.executor import flatten_tiles

            args = (
                flatten_tiles(b.sx),
                flatten_tiles(b.sy),
                jnp.asarray(b.nx),
                jnp.asarray(b.ny),
            )
            nd = b.max_diags
            runs.append(lambda a=args, nd=nd: _sw_dense_jit(*a, n_diags=nd))

    _ = [_force(r()) for r in runs]  # compile + warm

    def fenced(k):
        # k back-to-back dispatches of the whole workload, one fence
        # per bucket on the LAST rep (execution is in-order; skipping
        # the k-1 intermediate D2H copies is the point).
        best = float("inf")
        for _t in range(trials):
            t0 = time.perf_counter()
            for _ in range(k - 1):
                for r in runs:
                    r()
            for o in [r() for r in runs]:
                _force(o)
            best = min(best, time.perf_counter() - t0)
        return best

    # enough extra reps that the slope dwarfs timer noise even when one
    # rep is ~1 ms, without making the long points take minutes
    k2 = 2 + max(4, min(32, 4096 // max(length, 64)))
    t2, tk = fenced(2), fenced(k2)
    per = max((tk - t2) / (k2 - 2), 1e-9)
    cells = num_alignments * (length + 1) ** 2  # incl. '\n' lane, like the C
    return {
        "length": length,
        "unroll": unroll,
        "slope_reps": k2,
        "elapsed_ms": round(per * 1e3, 3),
        "gcups": round(cells / per / 1e9, 3),
    }


def run_sweep(lengths, unrolls, num_alignments, backend, json_out=None):
    rows = []
    print(f"SW sweep: {num_alignments} alignments per point, backend={backend}")
    print(f"{'LEN':>6} " + " ".join(f"u={u:>4}" for u in unrolls) + "   (elapsed ms / GCUPS)")
    for L in lengths:
        cells = []
        for u in unrolls:
            r = bench_sw_point(L, num_alignments, u, backend)
            rows.append(r)
            cells.append(f"{r['elapsed_ms']:>8.1f}/{r['gcups']:<6.1f}")
        print(f"{L:>6} " + " ".join(cells))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


def bench_pairhmm_point(n_reads: int, n_haps: int, read_len: int,
                        hap_len: int, backend: str, trials: int = 3,
                        seed: int = 0):
    """One PairHMM sweep point (the reference tuned PairHMM the same way
    but withheld the numbers, report_gkl_hpps.pdf §5)."""
    import jax.numpy as jnp

    from genomax.config import EngineConfig
    from genomax.engine.executor import Engine
    from genomax.io.generator import generate_pairhmm_batch
    from genomax.pack.bucketing import pack_pairhmm_batches

    batch = generate_pairhmm_batch(n_reads, n_haps, read_len=read_len,
                                   hap_len=hap_len, seed=seed)
    eng = Engine(EngineConfig(backend=backend))
    buckets, n = pack_pairhmm_batches([batch], bitmask_codes=True)
    runs = []
    cells = 0
    for b in buckets:
        cells += int((b.rl.astype(np.int64) * b.hl).sum())
        if eng.backend == "pallas":
            from genomax.kernels.pairhmm_pallas import (
                pairhmm_forward_pallas,
                pairhmm_forward_pallas_streamed,
            )

            fn = (
                pairhmm_forward_pallas_streamed
                if b.hap.shape[1] > eng.cfg.stream_vmem_rows
                else pairhmm_forward_pallas
            )
            args = tuple(jnp.asarray(x) for x in (
                b.rchar, b.qr, b.mmv, b.gapm, b.qi, b.qd, b.qg, b.hap,
                b.meta, b.ndiag_tile))
            runs.append(lambda a=args, f=fn, bm=b.bitmask_codes: f(
                *a, bitmask=bm))
        else:
            from genomax.engine.executor import _phmm_dense_jit, flatten_tiles

            args = (flatten_tiles(b.rchar), flatten_tiles(b.qr),
                    flatten_tiles(b.mmv), flatten_tiles(b.gapm),
                    flatten_tiles(b.qi), flatten_tiles(b.qd),
                    flatten_tiles(b.qg), flatten_tiles(b.hap),
                    jnp.asarray(b.rl), jnp.asarray(b.hl))
            nd = b.max_diags
            runs.append(lambda a=args, nd=nd, bm=b.bitmask_codes:
                        _phmm_dense_jit(*a, n_diags=-(-nd // 16) * 16,
                                        bitmask=bm))

    _ = [_force(r()) for r in runs]

    def fenced(k):
        # same slope-timing scheme as bench_sw_point (see its docstring)
        best = float("inf")
        for _t in range(trials):
            t0 = time.perf_counter()
            for _ in range(k - 1):
                for r in runs:
                    r()
            for o in [r() for r in runs]:
                _force(o)
            best = min(best, time.perf_counter() - t0)
        return best

    k2 = 2 + max(4, min(16, (1 << 31) // max(cells, 1)))
    t2, tk = fenced(2), fenced(k2)
    per = max((tk - t2) / (k2 - 2), 1e-9)
    return {
        "pairs": n,
        "read_len": read_len,
        "hap_len": hap_len,
        "slope_reps": k2,
        "elapsed_ms": round(per * 1e3, 3),
        "gcups": round(cells / per / 1e9, 3),
    }


def run_pairhmm_sweep(points, backend, json_out=None):
    """points: list of (n_reads, n_haps, read_len, hap_len)."""
    rows = []
    print(f"PairHMM sweep, backend={backend}")
    print(f"{'pairs':>8} {'read':>6} {'hap':>6} {'ms':>10} {'GCUPS':>8}")
    for nr, nh, rl, hl in points:
        r = bench_pairhmm_point(nr, nh, rl, hl, backend)
        rows.append(r)
        print(f"{r['pairs']:>8} {rl:>6} {hl:>6} {r['elapsed_ms']:>10.1f} "
              f"{r['gcups']:>8.2f}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows
