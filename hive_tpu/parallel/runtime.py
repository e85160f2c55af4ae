"""Process-wide device-mesh runtime: the ``--num_devices`` product flag.

The reference is strictly single-accelerator (SURVEY.md §2.4 — one CUDA GPU,
no distributed layer); here multi-chip execution is a first-class pipeline
feature. ``configure()`` runs once at pipeline start-up from
``PipelineOptions.num_devices``; every stage that can scale then picks the
mesh up via :func:`runtime_mesh`:

* sparse TSDF integration block-shards over the mesh
  (:func:`hive_tpu.parallel.fusion.integrate_frames_sharded`);
* isosurface extraction partitions its active-cube list over the mesh
  (:func:`hive_tpu.parallel.fusion.get_mesh_sharded`, byte-identical to
  single-device — on the one-chip tunnel it buys nothing because the host
  collect stream is the bound, see PARITY.md §2.4);
* DPT depth inference shards frame batches over the mesh
  (:class:`hive_tpu.models.dpt.DPTDepthEstimator`);
* pose optimisation shards correspondence residuals over the mesh
  (:func:`hive_tpu.pose_optimisation.optimise_packed_features`).

All communication is XLA collectives over ICI inserted by sharding
propagation — no stage needs explicit collectives (TSDF blocks and
correspondences are independent; only gradient reductions cross devices,
as automatic ``psum``).
"""

from __future__ import annotations

import logging
from typing import Optional

from jax.sharding import Mesh

from hive_tpu.parallel.mesh import get_device_mesh

_mesh: Optional[Mesh] = None


def configure(num_devices: int = 1) -> Optional[Mesh]:
    """Set the process-wide runtime mesh from the ``--num_devices`` flag.

    :param num_devices: ``1`` (default) disables the mesh — every stage runs
        single-device exactly as before. ``-1`` uses all local devices.
        ``n > 1`` builds an n-device mesh (falling back to virtual CPU
        devices when the default backend has fewer — see
        :func:`hive_tpu.parallel.mesh.get_device_mesh`).
    :return: The active mesh, or ``None`` for single-device execution.
    """
    global _mesh

    if num_devices in (0, 1):
        _mesh = None
        return None

    mesh = get_device_mesh(None if num_devices == -1 else num_devices)

    if mesh.devices.size < 2:
        # A 1-device mesh adds sharding machinery for no benefit.
        _mesh = None
        return None

    logging.info(f"Multi-device runtime: {mesh.devices.size} devices "
                 f"({mesh.devices.flat[0].platform}).")
    _mesh = mesh
    return mesh


def runtime_mesh() -> Optional[Mesh]:
    """The active device mesh, or ``None`` when running single-device."""
    return _mesh


def set_runtime_mesh(mesh: Optional[Mesh]) -> None:
    """Directly install (or clear) the runtime mesh — used by tests and by
    callers that build their own mesh."""
    global _mesh
    _mesh = mesh
