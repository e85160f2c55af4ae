"""Device mesh and sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.4/§5.8 — a single
CUDA GPU); this module is the framework's first-class TPU scaling story:

* **data axis** — frames are independent for depth inference, unprojection and
  TSDF integration, so frame batches shard over the ``data`` axis;
* **space axis** — the TSDF voxel grid shards its leading (X) axis over the
  ``space`` axis: integration is voxel-local (each voxel projects into the
  camera), so no halos and no collectives are needed, and frames broadcast;
* pose-graph optimisation shards residual terms over ``data`` with a ``psum``
  for gradient reduction (see :mod:`hive_tpu.pose_optimisation`).

All collectives ride ICI via standard XLA lowering of `jax.sharding`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_device_mesh(n_devices: Optional[int] = None,
                    axis_names: Sequence[str] = ("data",)) -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` local devices.

    With the default single axis, the same mesh serves both frame-parallel
    (shard batches) and volume-parallel (shard voxel X) work — they reuse the
    axis under different names via :func:`shard_batch`/:func:`shard_volume`.

    When the default backend has fewer than ``n_devices`` devices, falls back
    to the CPU backend (virtual host devices via
    ``--xla_force_host_platform_device_count``) so multi-chip code paths stay
    testable on single-accelerator machines.
    """
    devices = jax.devices()

    if n_devices is None:
        n_devices = len(devices)

    if n_devices <= 0:
        # runtime.configure special-cases -1 (= all devices) before calling
        # here; any non-positive count reaching this point is caller error —
        # numpy's reshape(-2) would otherwise raise an unrelated internals
        # error (review finding, r5).
        raise ValueError(f"n_devices must be positive, got {n_devices}")

    if n_devices > len(devices):
        try:
            cpu_devices = jax.devices("cpu")
        except RuntimeError:
            cpu_devices = []

        if len(cpu_devices) >= n_devices:
            devices = cpu_devices
        else:
            raise ValueError(f"Requested {n_devices} devices but only "
                             f"{len(devices)} are available.")

    if len(tuple(axis_names)) != 1:
        # Loud failure beats silently dropping axes: a NamedSharding over a
        # missing axis errors far from the cause (or runs unsharded).
        raise ValueError("get_device_mesh builds 1-D meshes; got axis_names="
                         f"{tuple(axis_names)}. Build multi-axis meshes with "
                         "jax.sharding.Mesh directly.")

    mesh_devices = np.array(devices[:n_devices]).reshape(n_devices)
    return Mesh(mesh_devices, axis_names=tuple(axis_names))


def shard_batch(mesh: Mesh, array, axis: int = 0):
    """Place an array with its ``axis`` sharded over the mesh's first axis."""
    spec = [None] * array.ndim
    spec[axis] = mesh.axis_names[0]
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def shard_volume(mesh: Mesh, volume, axis: int = 0):
    """Shard a voxel array over its X axis.

    ``axis=0`` for (X, Y, Z) tsdf/weight arrays; pass ``axis=1`` for the
    channel-plane colour array (3, X, Y, Z).
    """
    return shard_batch(mesh, volume, axis=axis)


def replicate(mesh: Mesh, array):
    """Fully replicate an array over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P()))


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Zero-pad ``axis`` up to a multiple (so it divides evenly over devices)."""
    size = array.shape[axis]
    padded = -size % multiple

    if padded == 0:
        return array

    pad_width = [(0, 0)] * array.ndim
    pad_width[axis] = (0, padded)
    return np.pad(array, pad_width)
