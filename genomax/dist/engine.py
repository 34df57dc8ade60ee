"""Multi-chip streaming dispatcher: the Engine's pack→dispatch→unpack
pipeline promoted to a device mesh (the multi-host streaming dispatcher
of BASELINE.json: read batches data-parallel over chips, haplotype data
replicated per pair slot by construction, scores all-gathered over ICI).

The reference is strictly single-GPU (SURVEY.md §2.3-2.4); this is the
distribution layer it never had. Per-host usage (multi-host pods):
call ``genomax.dist.mesh.initialize_distributed`` first, build the mesh
over ``jax.devices()``, and feed each process the full job list — every
host packs identically (numpy packing is cheap relative to scoring) and
``_put`` materializes only this process's addressable tile shards on
device (``jax.make_array_from_callback``), so the device feed is
host-sharded even though parsing is replicated; output order stays the
deterministic global packing order.
"""

from __future__ import annotations

import time

import numpy as np

from genomax.config import EngineConfig, PairHMMConfig, SWConfig
from genomax.dist.mesh import DATA_AXIS
from genomax.engine.executor import (Engine, RunStats, _run_buckets,
                                     phmm_bucket_stats, sw_bucket_stats)
from genomax.pack.bucketing import (
    pack_pairhmm_batches,
    pack_sw_pairs,
    pad_tiles_to,
    unpack_scores,
)


class ShardedEngine:
    """Engine twin that runs every bucket through the sharded
    (shard_map + all_gather) path on a device mesh."""

    def __init__(
        self,
        mesh,
        cfg: EngineConfig = EngineConfig(),
        sw_cfg: SWConfig = SWConfig(),
        phmm_cfg: PairHMMConfig = PairHMMConfig(),
        interpret: bool = False,
    ):
        import genomax

        genomax.setup_compilation_cache()
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.cfg = cfg
        self.sw_cfg = sw_cfg.validate()
        self.phmm_cfg = phmm_cfg
        self.interpret = interpret
        self.backend = cfg.resolve_backend()
        # "auto" resolves from the DEFAULT platform, but the mesh may be
        # the virtual-CPU fallback on a TPU host (make_mesh): compiled
        # Pallas only runs where the mesh actually lives.
        if (self.backend == "pallas" and not interpret
                and mesh.devices.flat[0].platform != "tpu"):
            self.backend = "lax"
        self.last_stats: RunStats | None = None

    def _put(self, arr):
        """Device placement: single-process -> plain transfer; multi-host
        -> global array assembled from this process's addressable shards
        only (tile dim sharded along the data axis)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if jax.process_count() == 1:
            return jnp.asarray(arr)
        spec = P(DATA_AXIS, *([None] * (arr.ndim - 1)))
        sharding = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def _put_replicated(self, arr):
        """Device placement, fully replicated (the factored pack's
        unique-row tables: every shard's gather needs all rows)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if jax.process_count() == 1:
            return jnp.asarray(arr)
        sharding = NamedSharding(self.mesh, P())
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    # Feature parity with the single-chip Engine (VERDICT r1 #1): the
    # same offload masks, the same long-pair / native post-passes, the
    # same fp64 deep-negative fallback — every execution path must
    # return one consistent answer per input (pairHMMmatrix.c:41-66).
    # Packing is replicated per host, so the native recomputes are
    # deterministic across hosts.
    _sw_offload_mask = Engine._sw_offload_mask
    _phmm_offload_mask = Engine._phmm_offload_mask
    _phmm_offload_post = Engine._phmm_offload_post
    _phmm_native_subset = Engine._phmm_native_subset
    _phmm_fallback = Engine._phmm_fallback

    def _sw_offload_post(self, pairs, out, off, stats):
        """Mesh twin of Engine._sw_offload_post: offloaded pairs whose x
        length reaches cfg.xshard_min_len score through the CROSS-CHIP
        wavefront (dist/xsharded.py — one DP matrix, K per-device
        strips, ppermute halos), up to 128 per lane tile; the remainder
        (and any xshard failure) flows through the shared single-chip
        post-pass (sw_long / native) so every path still returns one
        consistent answer per input (SURVEY §7 step 7; the routing
        analog of the reference wiring alignGPU into its main,
        smithWaterman.cu:466)."""
        xmin = self.cfg.xshard_min_len
        if off is None or xmin is None:
            return Engine._sw_offload_post(self, pairs, out, off, stats)
        idx = np.nonzero(off)[0]
        xidx = np.array([i for i in idx if len(pairs[i].sx) >= xmin],
                        dtype=np.int64)
        rest = off.copy()
        if len(xidx):
            from genomax.dist.xsharded import (pack_sw_xsharded,
                                               sw_forward_xsharded)
            from genomax.pack.bucketing import LANES

            # The cross-chip block kernel is Pallas-only: interpret it
            # off-TPU (the CPU-mesh tests / virtual-mesh dry runs).
            interp = (self.interpret
                      or self.mesh.devices.flat[0].platform != "tpu")
            try:
                for s in range(0, len(xidx), LANES):
                    tile = xidx[s : s + LANES]
                    pk = pack_sw_xsharded(
                        [pairs[i] for i in tile], self.n_devices,
                        unroll=self.cfg.unroll)
                    scores = np.asarray(sw_forward_xsharded(
                        self._put(pk.sx),
                        # replicated stream: a host-local jnp.asarray is
                        # not a global array under process_count > 1 and
                        # would fail at dispatch, silently demoting every
                        # huge pair to the single-chip path via the
                        # except below
                        self._put_replicated(pk.sy),
                        mesh=self.mesh,
                        strip_w=pk.strip_w,
                        n_diags=pk.n_diags,
                        unroll=pk.unroll,
                        anchor=pk.anchor,
                        cfg=self.sw_cfg,
                        interpret=interp,
                    ))
                    out[tile] = scores[: len(tile)]
                rest[xidx] = False
                stats.xsharded_jobs += len(xidx)
                stats.offloaded_jobs += len(xidx)
            except Exception as e:
                # rest mask still covers xidx: single-chip post-pass
                # scores them — but say so, or a broken xshard path
                # looks like a working one with xsharded_jobs=0.
                import sys

                print(
                    f"genomax: cross-chip wavefront dispatch failed "
                    f"({e!r}); rerouting {len(xidx)} pairs through the "
                    f"single-chip offload path",
                    file=sys.stderr,
                )
        if rest.any():
            Engine._sw_offload_post(self, pairs, out, rest, stats)

    def sw_scores(self, pairs) -> np.ndarray:
        from genomax.dist.sharded import sw_forward_sharded

        stats = RunStats(n_jobs=len(pairs))
        off = self._sw_offload_mask(pairs)
        t0 = time.perf_counter()
        buckets = [
            pad_tiles_to(b, self.n_devices)
            for b in pack_sw_pairs(
                pairs, job_mask=None if off is None else ~off,
                stream_band=Engine._stream_band(self),
            )
        ]
        stats.pack_s = time.perf_counter() - t0
        stats.buckets = len(buckets)
        sw_bucket_stats(stats, buckets)
        t0 = time.perf_counter()

        def dispatch(b):
            # Same kernel routing as the local engine: mid/large buckets
            # ride the strip-mined kernel inside shard_map.
            strips = None
            rotor = None
            nyt = None
            sxa = b.sx
            sya = b.sy
            if self.backend == "pallas":
                from genomax.kernels.sw_rotor import maybe_prep_rotor
                from genomax.kernels.sw_strips import maybe_prep_strips

                prep = maybe_prep_strips(self.cfg, b)
                if prep is not None:
                    (sxa, _, _, nyt_arr), st = prep
                    strips = (st["k_strips"], st["strip_w"], st["anchor"])
                    nyt = nyt_arr
                else:
                    # same short-bucket routing as the local engine:
                    # the column-stationary rotor (kernels/sw_rotor.py),
                    # re-tiled so the rotor tile count divides the mesh
                    rprep = maybe_prep_rotor(self.cfg, b,
                                             n_shards=self.n_devices)
                    if rprep is not None:
                        (sxa, sya), st = rprep
                        rotor = (st["period"], st["n_slots"],
                                 st["anchor"], st["unroll"])
            # Nibble-compressed transfer, same contract as the local
            # engine: ship 4-bit codes, expand AFTER placement —
            # elementwise, so it runs SPMD on the tile-sharded array
            # with no collectives (like expand_byte_quals below).
            from genomax.pack.nibble import ship_stream, stream_bytes

            ship = self._put
            if self.backend == "pallas" and self.cfg.nibble_transfer:
                from genomax.pack.nibble import build_code_lut, make_shipper

                ship = make_shipper(self._put,
                                    lut=build_code_lut(sxa,
                                                       stream_bytes(sya)))
            return sw_forward_sharded(
                ship(sxa),
                ship_stream(ship, sya),
                self._put(b.nx.reshape(-1, 128)).reshape(-1),
                self._put(b.ny.reshape(-1, 128)).reshape(-1),
                self._put(b.ndiag_tile),
                mesh=self.mesh,
                n_diags=-(-b.max_diags // 32) * 32,
                cfg=self.sw_cfg,
                unroll=self.cfg.unroll,
                backend=self.backend,
                interpret=self.interpret,
                stream_vmem_rows=self.cfg.stream_vmem_rows,
                strips=strips,
                rotor=rotor,
                nyt_tile=None if nyt is None else self._put(nyt),
            )

        results = _run_buckets("sw-sharded", buckets, dispatch)
        stats.exec_s = time.perf_counter() - t0
        out = unpack_scores(buckets, results, len(pairs), np.int32)
        self._sw_offload_post(pairs, out, off, stats)
        self.last_stats = stats
        return out

    def pairhmm(self, batches) -> np.ndarray:
        from genomax.dist.sharded import pairhmm_forward_sharded

        stats = RunStats()
        off = self._phmm_offload_mask(batches)
        t0 = time.perf_counter()
        buckets, n = pack_pairhmm_batches(
            batches,
            self.phmm_cfg.phred_offset,
            job_mask=None if off is None else ~off,
            byte_quals=self.backend == "pallas",
            factored=self.backend == "pallas" and self.cfg.factored_transfer,
            bitmask_codes=True,
        )
        buckets = [pad_tiles_to(b, self.n_devices) for b in buckets]
        stats.pack_s = time.perf_counter() - t0
        stats.n_jobs = n
        stats.buckets = len(buckets)
        phmm_bucket_stats(stats, buckets)
        t0 = time.perf_counter()

        def dispatch(b):
            if b.rchar_u is not None:
                # factored pack: unique-row tables replicated, gather
                # indices tile-sharded; the device-side rebuild
                # (expand_factored) is a per-shard gather from the
                # replicated tables — SPMD, no collectives.
                from genomax.kernels.pairhmm_pallas import expand_factored

                rchar, *quals, hap = expand_factored(
                    self._put_replicated(b.rchar_u),
                    self._put_replicated(b.qb_u),
                    self._put_replicated(b.hap_u),
                    self._put(b.ridx),
                    self._put(b.hidx),
                    float(self.phmm_cfg.phred_offset),
                )
            else:
                if b.qb is not None:
                    # byte_quals: expand AFTER placement — elementwise,
                    # so it runs SPMD on the tile-sharded qb with no
                    # collectives
                    from genomax.kernels.pairhmm_pallas import (
                        expand_byte_quals,
                    )

                    quals = expand_byte_quals(
                        self._put(b.qb), float(self.phmm_cfg.phred_offset)
                    )
                else:
                    quals = (
                        self._put(b.qr),
                        self._put(b.mmv),
                        self._put(b.gapm),
                        self._put(b.qi),
                        self._put(b.qd),
                        self._put(b.qg),
                    )
                # Bitmask codes are 4-bit: nibble-pack rchar + the hap
                # stream (no remap), expand post-placement like qb above.
                # Gated on the pallas backend like the local engine and
                # the sharded SW path — on lax/CPU meshes the pack/expand
                # round-trip is pure overhead with nothing to compress
                # over.
                from genomax.pack.nibble import make_shipper

                ship = make_shipper(
                    self._put,
                    four_bit=(b.bitmask_codes and self.cfg.nibble_transfer
                              and self.backend == "pallas"),
                )
                rchar, hap = ship(b.rchar), ship(b.hap)
            return pairhmm_forward_sharded(
                rchar,
                *quals,
                hap,
                self._put(b.meta),
                self._put(b.rl.reshape(-1, 128)).reshape(-1),
                self._put(b.hl.reshape(-1, 128)).reshape(-1),
                self._put(b.ndiag_tile),
                mesh=self.mesh,
                n_diags=-(-b.max_diags // self.cfg.rescale_period)
                * self.cfg.rescale_period,
                rescale_period=self.cfg.rescale_period,
                backend=self.backend,
                interpret=self.interpret,
                stream_vmem_rows=self.cfg.stream_vmem_rows,
                mm_div=self.phmm_cfg.mm_div,
                bitmask=b.bitmask_codes,
            )

        results = _run_buckets("pairhmm-sharded", buckets, dispatch)
        stats.exec_s = time.perf_counter() - t0
        out = unpack_scores(buckets, results, n, np.float32)
        out, native_done = self._phmm_offload_post(batches, out, off, stats)
        out = self._phmm_fallback(batches, out, stats, skip=native_done)
        self.last_stats = stats
        return out
