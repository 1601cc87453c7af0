"""Device mesh and sharding helpers.

The reference's parallelism surface (SURVEY §2.11) maps to JAX as:
- DDP training            -> batch sharded over the ``data`` mesh axis;
                             XLA inserts the gradient psum over ICI.
- TTA-variant sharding    -> variants split over ``data`` axis (tta.py).
- Window-grid sharding    -> window batches sharded over ``data`` (window.py).
- Independent shards      -> no mesh at all (runtime/sharding.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a Mesh from ``{axis: size}`` (e.g. ``{"data": 8}``).

    Multi-process: ``jax.devices()`` lists devices grouped by process, so a
    naive prefix ``devices[:total]`` would put every mesh slot on process 0
    and leave the other processes addressing NOTHING (their
    ``make_array_from_process_local_data`` then fails). When the mesh uses
    fewer devices than exist, draw ``total / process_count`` from EACH
    process, in process order — the leading (data) axis then matches the
    pipeline's process-major global slot order."""
    devices = devices if devices is not None else jax.devices()
    mesh_axes = dict(mesh_axes or {"data": len(devices)})
    sizes = list(mesh_axes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {mesh_axes} needs {total} devices, have {len(devices)}")
    nproc = jax.process_count()
    if total < len(devices) and nproc > 1:
        if total % nproc != 0:
            raise ValueError(
                f"mesh {mesh_axes} ({total} devices) not divisible by "
                f"process_count {nproc}: every process must own an equal "
                f"slice of the batch"
            )
        per_proc: Dict[int, list] = {}
        for d in devices:
            per_proc.setdefault(d.process_index, []).append(d)
        k = total // nproc
        chosen = []
        for p in sorted(per_proc):
            if len(per_proc[p]) < k:
                raise ValueError(
                    f"process {p} has {len(per_proc[p])} devices, need {k}"
                )
            chosen.extend(per_proc[p][:k])
        devices = chosen
    dev_array = arrange_devices(list(devices[:total]), mesh_axes, nproc)
    return Mesh(dev_array, tuple(mesh_axes))


def arrange_devices(devices: list, mesh_axes: Dict[str, int], nproc: int) -> np.ndarray:
    """Arrange a process-major device list into the mesh array so the
    ``data`` axis is process-major REGARDLESS of its position in the axes
    dict: reshape data-first, then move the data axis into its declared
    slot. With ``{"space": 2, "data": 4}`` and 2 processes, the naive
    dict-order reshape would give every data slot devices from BOTH
    processes — each process then owns a *space* slice, and
    ``make_array_from_process_local_data`` over the batch dim mis-assembles.
    Single-process keeps the plain dict-order reshape (any arrangement is
    valid; avoids relayout churn vs older meshes)."""
    names = list(mesh_axes)
    sizes = [mesh_axes[n] for n in names]
    if nproc <= 1 or "data" not in mesh_axes:
        return np.array(devices).reshape(sizes)
    if mesh_axes["data"] % nproc != 0:
        raise ValueError(
            f"data axis size {mesh_axes['data']} not divisible by "
            f"process_count {nproc}: every process must own an equal "
            f"batch slice"
        )
    di = names.index("data")
    order = [mesh_axes["data"]] + [mesh_axes[n] for n in names if n != "data"]
    arr = np.array(devices).reshape(order)
    return np.moveaxis(arr, 0, di)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis; when the mesh also has
    a ``space`` axis, shard the z (dim 1) spatially — GSPMD inserts conv
    halo exchanges automatically (spatial partitioning; the TPU-native
    answer to activation-memory-bound 3-D patches)."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(axis, "space"))
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Shard a host batch over the batch dim.

    Single-host: plain ``device_put``. Multi-host: each process holds only
    its local slice, so assemble the global array from process-local data
    (``jax.make_array_from_process_local_data``); global batch = local x
    process_count, matching the pipeline's global-slot sampling."""
    s = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    return jax.tree.map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def fit_data_axis_to_batch(mesh_axes: Dict[str, int], batch_size: int, n_devices: int) -> Dict[str, int]:
    """Shrink the ``data`` axis to the largest divisor of ``batch_size`` that
    fits the device count, so per-device batches stay uniform (the reference
    similarly auto-reduces devices vs work items, ``runtime/sharding.py:91``).

    Multi-process: the data axis must additionally be a multiple of
    ``process_count`` so every process owns an equal batch slice (see
    ``make_mesh``)."""
    axes = dict(mesh_axes or {"data": n_devices})
    want = min(axes.get("data", n_devices), n_devices)
    nproc = jax.process_count()
    ok = [
        k for k in range(1, want + 1)
        if batch_size % k == 0 and (nproc == 1 or k % nproc == 0)
    ]
    if not ok:
        raise ValueError(
            f"no data-axis size <= {want} divides batch {batch_size} and "
            f"is a multiple of process_count {nproc}"
        )
    axes["data"] = max(ok)
    return axes
