"""Device mesh and multi-host process-group setup.

The reference is strictly single-process / single-GPU (it even hardcodes
`cudaSetDevice(1)`, smithWaterman.cu:391, pairHMM.cu:376) — this module
is the distribution layer it never had, built the TPU way:
`jax.distributed` for the multi-host process group, a 1-D "data" mesh
over all chips of the slice, `shard_map` for the per-chip kernels, XLA
all-gather over ICI/DCN to merge scores (SURVEY.md §2.3-2.4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host init. No-op on a single process with no coordinator —
    single-host callers can always call this unconditionally."""
    if coordinator is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the slice (or the first n devices).

    If the default platform doesn't expose enough devices (e.g. a single
    tunneled TPU chip), falls back to the host-platform CPU devices so
    sharding logic can be exercised anywhere
    (--xla_force_host_platform_device_count)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: jax>=0.8 exposes jax.shard_map
    (check_vma), older versions jax.experimental.shard_map (check_rep).
    Replication checking is disabled either way (the per-shard kernels
    return identical all-gathered results by construction). Feature-
    probed by signature so genuine TypeErrors from the call surface."""
    import inspect

    try:
        from jax import shard_map as _sm
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
    kw = (
        {"check_vma": False}
        if "check_vma" in inspect.signature(_sm).parameters
        else {"check_rep": False}
    )
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)
