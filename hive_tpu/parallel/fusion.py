"""Space-sharded sparse TSDF integration: ``shard_map`` over the block axis.

The reference integrates on a single GPU (SURVEY.md §2.4 — no distributed
layer); here the production sparse integrator (hive_tpu.ops.tsdf_sparse)
scales over a device mesh by sharding the block-major voxel state on its
leading (block) axis. Blocks are independent — every stage (classification,
free-space update, banded gather/scatter) reads only its own blocks and the
replicated frame — so the step needs NO collectives: each device classifies
and updates its slab of blocks, and sharding propagation keeps the state
resident. Frames, intrinsics and poses replicate (a VGA frame is ~1 MB; the
volume is GBs).

Load balance: with ``placement="contiguous"`` blocks shard as contiguous
slabs along the leading (x) axis, so a surface concentrated in one x-range
(an axis-aligned wall, a camera sweeping along x) lands its band blocks on
few devices. ``placement="cyclic"`` (the default) applies a block-cyclic row
permutation first — device d holds blocks d, d+n, d+2n, ... of the x-major
grid — which interleaves spatially-adjacent blocks across all devices, so
every device sees ~1/n of the band wherever the surface sits. Integration is
permutation-invariant (blocks are independent and carry their origins as
data), so both placements are bit-identical to the single-device result;
only dense extraction un-permutes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hive_tpu.ops.tsdf_sparse import SparseTSDFState, SparseTSDFVolume

try:  # JAX >= 0.8 top-level; fall back for older releases.
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def shard_sparse_state(volume: SparseTSDFVolume, mesh: Mesh,
                       axis: str = "data",
                       placement: str = "cyclic") -> None:
    """Re-place ``volume.state`` (and block origins) sharded over ``axis``.

    The block count must divide by the mesh axis size (block counts are grid
    products, so choose grids accordingly; the default 256^3 / (8, 8, 8)
    grid gives 32768 blocks — divisible by any power-of-two mesh).

    :param placement: ``"cyclic"`` (default) round-robins blocks over the
        devices for load balance; ``"contiguous"`` keeps x-major slabs (see
        module docstring).
    """
    n = mesh.shape[axis]
    nb = volume.num_blocks

    if nb % n != 0:
        raise ValueError(f"num_blocks={nb} must divide over mesh axis "
                         f"'{axis}' of size {n}")

    if placement == "cyclic":
        # Row order [0, n, 2n, ..., 1, 1+n, ...]: contiguous per-device
        # slabs of the sharded axis then hold blocks {d, d+n, d+2n, ...}.
        volume.apply_block_permutation(
            np.arange(nb).reshape(nb // n, n).T.reshape(-1))
    elif placement != "contiguous":
        raise ValueError(f"unknown placement {placement!r}")

    row = NamedSharding(mesh, P(axis, None))
    volume.state = SparseTSDFState(
        tsdf=jax.device_put(volume.state.tsdf, row),
        weight=jax.device_put(volume.state.weight, row),
        color=jax.device_put(volume.state.color, row),
    )
    volume._block_origins_dev = jax.device_put(
        jnp.asarray(volume.block_origins), row)


def build_sharded_integrator(volume: SparseTSDFVolume, mesh: Mesh,
                             height: int, width: int, axis: str = "data",
                             compact_cap=None):
    """A jitted ``(state, block_origins, depths, colors, world_to_cams, intr,
    obs_weights) -> state`` over ``mesh``, with the state and block origins
    sharded on the block axis and everything else replicated.

    The per-device program is the SAME scan body the single-chip path runs —
    ``_build_integrator`` derives all block counts from array shapes, so
    inside ``shard_map`` it simply sees the local slab.
    """
    integ = volume._build_integrator(height, width, compact_cap=compact_cap)

    state_spec = SparseTSDFState(tsdf=P(axis, None), weight=P(axis, None),
                                 color=P(axis, None))

    specs = dict(
        mesh=mesh,
        in_specs=(state_spec, P(axis, None), P(), P(), P(), P(), P()),
        out_specs=state_spec,
    )
    # The body creates fresh (unvarying) carries inside the per-shard scan;
    # disable the varying-manual-axes / replication checker (renamed
    # check_rep -> check_vma across JAX releases).
    try:
        sharded = shard_map(integ.scan_impl, check_vma=False, **specs)
    except TypeError:  # pragma: no cover — older JAX
        sharded = shard_map(integ.scan_impl, check_rep=False, **specs)

    return jax.jit(sharded, donate_argnums=(0,))


def integrate_frames_sharded(volume: SparseTSDFVolume, mesh: Mesh,
                             colors, depths, camera_matrix, cam_to_world_poses,
                             obs_weights=None, axis: str = "data"):
    """Sharded counterpart of ``SparseTSDFVolume.integrate_frames``.

    Call :func:`shard_sparse_state` once first to place the state; this then
    runs the space-sharded scan and keeps ``volume.state`` sharded.
    """
    from hive_tpu.ops.tsdf_sparse import (pick_compact_cap,
                                          prepare_integration_inputs)

    # Shared preprocessing with the single-device path (ONE definition —
    # the bit-identical contract depends on it; review finding, r5).
    (depths, colors, world_to_cams, intr,
     obs_weights) = prepare_integration_inputs(
        colors, depths, camera_matrix, cam_to_world_poses, obs_weights)
    _, height, width = depths.shape

    # Same host-side compacted-classification choice as the single-device
    # path; block-cyclic placement spreads candidates evenly, so the global
    # fraction is also each shard's fraction.
    cap = pick_compact_cap(volume.estimate_candidate_fraction(
        camera_matrix, cam_to_world_poses, height, width))

    # The Mesh itself (hashable) — id(mesh) could alias a garbage-collected
    # mesh at the same address and reuse a program bound to dead devices.
    key = ("sharded", height, width, mesh, axis, cap)
    cache = getattr(volume, "_sharded_integrators", None)
    if cache is None:
        cache = volume._sharded_integrators = {}
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = build_sharded_integrator(volume, mesh, height, width,
                                                   axis=axis, compact_cap=cap)

    volume.state = fn(volume.state, volume.block_origins_device, depths,
                      colors, world_to_cams, intr, obs_weights)
    return volume


def get_mesh_sharded(volume: SparseTSDFVolume, mesh: Mesh, axis: str = "data",
                     chunk_size: int = 1 << 15):
    """Device-parallel isosurface extraction over ``mesh``: the active-cube
    list partitions across devices, each device emits its shard's triangles
    with the SAME kernel the single-device path runs, and the host welds the
    concatenated streams.

    Sharding layout: active cubes shard over ``axis``; the voxel state
    REPLICATES (triangle emission gathers the 8 corner values of each cube
    from arbitrary neighbouring block rows, so a space-sharded state would
    need halo exchanges for the one cube layer at every shard face —
    replication is the reference-free design choice here, mirroring how
    integration replicates the frames and shards the volume).

    Bit-equality contract: the partition preserves active-cube order and
    the emission compaction preserves relative order within a shard, so the
    concatenated emitted stream — and therefore the welded mesh — is
    byte-identical to ``volume.get_mesh()`` (tested in
    tests/test_parallel.py). Returns the same (vertices, faces, normals,
    colors) tuple as ``get_mesh``.

    Perf note (PARITY.md §2.4): on the single-real-chip tunnel this path
    buys nothing — extraction there is bound by the serialized host collect
    stream, not device compute (depth-6 vs depth-2 software pipeline A/B
    measured 1.954 vs 1.982 s, within noise). It exists for real multi-chip
    hardware, where per-device emission divides the compute and each
    device's link ships its own shard.
    """
    from hive_tpu.ops.marching import (EMISSION_LANES,
                                       _active_cubes_blocked_sparse,
                                       _emit_triangles_blocked,
                                       _empty_mesh, append_trimmed_lanes,
                                       check_blocked_colour_addressing,
                                       decode_active_coords, transfer_width,
                                       weld_and_assemble)

    # Canonical x-major block order (un-permute block-cyclic placement),
    # replicated across the mesh.
    tsdf_b, weight_b, color_b = volume.state
    if volume._block_perm is not None:
        inv = jnp.asarray(np.argsort(volume._block_perm))
        tsdf_b, weight_b, color_b = tsdf_b[inv], weight_b[inv], color_b[inv]
    replicated = NamedSharding(mesh, P())
    tsdf_b = jax.device_put(tsdf_b, replicated)
    weight_b = jax.device_put(weight_b, replicated)
    color_b = jax.device_put(color_b, replicated)

    grid_blocks = volume.grid_blocks
    block_size = volume.block_size
    dims = tuple(g * b for g, b in zip(grid_blocks, block_size))
    # Same int32 colour-addressing refusal as the single-device entry point
    # (this path exists for real multi-chip parts, where huge volumes are
    # the point — silently wrong colours past ~715M voxels otherwise).
    check_blocked_colour_addressing(volume.num_voxels)

    lin = _active_cubes_blocked_sparse(tsdf_b, weight_b,
                                       grid_blocks=grid_blocks,
                                       block_size=block_size)
    if len(lin) == 0:
        verts, faces, colors, normals = _empty_mesh()
        return verts, faces, normals, colors

    active = decode_active_coords(lin, dims)

    n = mesh.shape[axis]
    # Cubes per device per round, padded to a power-of-two class (floor
    # 512/device) so extractions of different scenes reuse compiled
    # emission programs instead of compiling per distinct count; capacity
    # never overflows (<= 12 tris/cube).
    per_dev = -(-len(active) // n)
    per_dev = min(chunk_size,
                  1 << max(9, int(np.ceil(np.log2(max(per_dev, 1))))))
    capacity = per_dev * 12
    tsdf_flat = tsdf_b.reshape(-1)
    color_flat = color_b.reshape(-1)

    def body(tsdf_f, color_f, chunk, count):
        lanes, cnt = _emit_triangles_blocked(
            tsdf_f, color_f, chunk[0], count[0], dims=dims,
            grid_blocks=grid_blocks, block_size=block_size,
            capacity=capacity)
        return lanes[None], cnt[None]

    try:
        emit = shard_map(body, mesh=mesh,
                         in_specs=(P(), P(), P(axis, None, None), P(axis)),
                         out_specs=(P(axis, None, None), P(axis)),
                         check_vma=False)
    except TypeError:  # pragma: no cover — older JAX spells the flag check_rep
        emit = shard_map(body, mesh=mesh,
                         in_specs=(P(), P(), P(axis, None, None), P(axis)),
                         out_specs=(P(axis, None, None), P(axis)),
                         check_rep=False)
    emit = jax.jit(emit)

    parts = {name: [] for name in EMISSION_LANES}
    stride = n * per_dev

    def dispatch(start):
        sl = active[start:start + stride]
        counts = np.clip(len(sl) - per_dev * np.arange(n), 0,
                         per_dev).astype(np.int32)
        if len(sl) < stride:
            sl = np.concatenate(
                [sl, np.zeros((stride - len(sl), 3), np.int32)])
        return emit(tsdf_flat, color_flat,
                    jnp.asarray(sl.reshape(n, per_dev, 3)),
                    jnp.asarray(counts))

    # Same two transfer disciplines as the single-device collect loop
    # (ops/marching._chunked_extract_and_weld — extraction is bound by the
    # serialized host collect stream, not device compute): a depth-2
    # software pipeline overlaps one round's transfers with the next
    # round's emission, and the lane transfer is trimmed to the round's
    # max per-device count rounded up to a 4096-multiple width class (one
    # tiny slice program per class; block-cyclic placement keeps
    # per-device counts close, so the over-the-max waste is small).
    starts = list(range(0, len(active), stride))
    queue = [dispatch(s) for s in starts[:1]]
    next_dispatch = 1

    for _ in range(len(starts)):
        if next_dispatch < len(starts):
            queue.append(dispatch(starts[next_dispatch]))
            next_dispatch += 1

        lanes, cnts = queue.pop(0)
        cnts = np.asarray(cnts)
        nv_max = 3 * int(cnts.max()) if len(cnts) else 0
        lanes = np.asarray(lanes[:, :, :transfer_width(nv_max,
                                                       lanes.shape[2])])
        # Device order = active order: the concatenated stream matches the
        # single-device chunk stream element-for-element; lane decode is the
        # shared append_trimmed_lanes (one definition, see ops/marching).
        for d in range(n):
            append_trimmed_lanes(parts, lanes[d], 3 * int(cnts[d]))

    flat = {name: np.concatenate(chunks) for name, chunks in parts.items()}
    vertices, faces, colors, normals = weld_and_assemble(
        flat, dims, volume.origin, volume.voxel_size)
    return vertices, faces, normals, colors
