"""TSDF voxel-volume fusion on TPU.

This replaces the reference's PyCUDA kernel (third_party/tsdf_fusion_python,
driven from hive/fusion.py:79-134) with an XLA-native design:

* the voxel grid lives in device HBM as three arrays (tsdf, weight, colour);
* one frame integration is a single fused elementwise+gather kernel — each
  voxel projects into the camera (gather from the depth/colour image) and
  updates its running means. No scatter, no atomics, no host round-trips;
* whole sequences integrate with ``lax.scan`` over frames resident on device,
  so N frames = 1 compiled program;
* multi-device: shard the voxel X-axis across a mesh — integration is
  voxel-local so no halos or collectives are needed (frames are broadcast).

The camera model/convention matches :mod:`hive_tpu.core.transforms`; poses
passed to ``integrate`` are camera-to-world matrices, like the reference's
``TSDFVolume.integrate`` (hive/fusion.py:110-124).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFState(NamedTuple):
    """The device-resident voxel grid: all (X, Y, Z) float32 (+ RGB channels)."""

    tsdf: jnp.ndarray    # truncated signed distance, in [-1, 1], init 1
    weight: jnp.ndarray  # accumulated observation weight, init 0
    color: jnp.ndarray   # (3, X, Y, Z) running-mean RGB channel planes in
                         # [0, 255] — channel-last (X, Y, Z, 3) would tile-pad
                         # the minor dim 3 -> 128 (42x HBM expansion on TPU)


def _integrate_one(state: TSDFState, frame, *, origin, voxel_size, trunc_margin,
                   dims, height, width):
    """Fuse one RGB-D frame into the volume. Runs fully on device.

    ``frame`` = (depth (H, W) f32 meters, color (H, W, 3) f32, world_to_cam
    (4, 4) f32, obs_weight f32 scalar, intrinsics (4,) f32 [fx fy cx cy]).
    """
    depth, color_im, world_to_cam, obs_weight, intrinsics = frame
    X, Y, Z = dims

    # Voxel centre positions are affine in the voxel index, so camera-space
    # coordinates decompose into outer sums of three 1-D terms — XLA fuses
    # this into the main update loop without materialising a world-coordinate
    # tensor.
    R = world_to_cam[:3, :3]
    t = world_to_cam[:3, 3]

    ix = jax.lax.broadcasted_iota(jnp.float32, (X, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (1, Y, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (1, 1, Z), 2)

    base = R @ origin + t  # camera-space position of voxel (0, 0, 0)
    step = R * voxel_size  # columns: camera-space delta per +1 voxel index

    cam_x = base[0] + ix * step[0, 0] + iy * step[0, 1] + iz * step[0, 2]
    cam_y = base[1] + ix * step[1, 0] + iy * step[1, 1] + iz * step[1, 2]
    cam_z = base[2] + ix * step[2, 0] + iy * step[2, 1] + iz * step[2, 2]

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    safe_z = jnp.where(cam_z > 1e-6, cam_z, 1.0)
    u = jnp.round(fx * cam_x / safe_z + cx).astype(jnp.int32)
    v = jnp.round(fy * cam_y / safe_z + cy).astype(jnp.int32)

    in_view = (cam_z > 1e-6) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

    flat_idx = jnp.clip(v, 0, height - 1) * width + jnp.clip(u, 0, width - 1)
    depth_val = jnp.take(depth.reshape(-1), flat_idx)

    sdf = depth_val - cam_z
    valid = in_view & (depth_val > 0.0) & (sdf >= -trunc_margin)

    dist = jnp.minimum(1.0, sdf / trunc_margin)

    # Accumulate in fp32 regardless of storage dtype (bf16 storage halves HBM
    # traffic — the bandwidth bound of this kernel — with ~0.1 mm SDF
    # resolution at default voxel sizes).
    store_dtype = state.tsdf.dtype

    w_old = state.weight.astype(jnp.float32)
    w_obs = jnp.where(valid, obs_weight, 0.0)
    w_new = w_old + w_obs
    safe_w = jnp.maximum(w_new, 1e-12)

    tsdf_old = state.tsdf.astype(jnp.float32)
    # w_obs > 0 guard: a zero obs_weight frame must be a no-op — without it
    # (tsdf*0 + dist*0)/1e-12 zeroes the tsdf (the isosurface value) at
    # never-observed voxels. Mirrors the sparse band path (bit-oracle
    # contract); bit-identical for w_obs > 0.
    upd = valid & (w_obs > 0.0)
    tsdf_new = jnp.where(upd, (tsdf_old * w_old + dist * w_obs) / safe_w, tsdf_old)

    # One packed-uint32 gather for colour (r | g<<8 | b<<16): 2 serialized
    # gathers per voxel total (depth + colour) instead of 4.
    c = jnp.clip(color_im, 0.0, 255.0).astype(jnp.uint32)
    packed_im = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)
    packed = jnp.take(packed_im.reshape(-1), flat_idx)
    rgb = jnp.stack([(packed & 0xFF).astype(jnp.float32),
                     ((packed >> 8) & 0xFF).astype(jnp.float32),
                     ((packed >> 16) & 0xFF).astype(jnp.float32)], axis=0)

    color_old = state.color.astype(jnp.float32)
    color_new = jnp.where(upd[None],
                          (color_old * w_old[None] + rgb * w_obs[None])
                          / safe_w[None],
                          color_old)

    return TSDFState(tsdf=tsdf_new.astype(store_dtype),
                     weight=w_new.astype(store_dtype),
                     color=color_new.astype(store_dtype)), None


@partial(jax.jit, static_argnames=("dims", "height", "width"), donate_argnums=(0,))
def _integrate_frames_scan(state: TSDFState, depths, colors, world_to_cams, intrinsics,
                           obs_weights, origin, voxel_size, trunc_margin, *,
                           dims, height, width):
    """Scan-integrate a whole stack of frames resident on device."""

    def step(carry, frame):
        return _integrate_one(carry, frame, origin=origin, voxel_size=voxel_size,
                              trunc_margin=trunc_margin, dims=dims,
                              height=height, width=width)

    state, _ = jax.lax.scan(step, state,
                            (depths, colors, world_to_cams, obs_weights, intrinsics))
    return state


class TSDFVolume:
    """An HBM-resident truncated signed distance volume.

    API-compatible with the reference's ``fusion.TSDFVolume`` (constructed from
    (3, 2) volume bounds + voxel size, ``integrate(color, depth, K, pose)``,
    ``get_mesh()``), but batched: prefer :meth:`integrate_frames` which fuses a
    whole frame stack in one compiled scan.
    """

    def __init__(self, volume_bounds, voxel_size: float, trunc_margin: Optional[float] = None,
                 use_color: bool = True, dtype=jnp.float32):
        """
        :param dtype: Storage dtype for the voxel arrays. ``jnp.bfloat16``
            halves HBM traffic (the integration kernel's bound) at ~8-bit SDF
            mantissa precision — ample at millimetre voxel sizes.
        """
        volume_bounds = np.asarray(volume_bounds, dtype=np.float32)

        if volume_bounds.shape != (3, 2):
            raise ValueError(f"volume_bounds must be (3, 2), got {volume_bounds.shape}")

        self.voxel_size = float(voxel_size)
        self.trunc_margin = float(trunc_margin if trunc_margin is not None
                                  else 5.0 * voxel_size)

        dims = np.ceil((volume_bounds[:, 1] - volume_bounds[:, 0]) / voxel_size).astype(int)
        self.dims: Tuple[int, int, int] = tuple(int(d) for d in np.maximum(dims, 1))
        self.origin = volume_bounds[:, 0].copy()
        self.volume_bounds = volume_bounds

        X, Y, Z = self.dims
        self.state = TSDFState(
            tsdf=jnp.ones((X, Y, Z), dtype=dtype),
            weight=jnp.zeros((X, Y, Z), dtype=dtype),
            color=jnp.zeros((3, X, Y, Z), dtype=dtype),
        )

        self._use_color = use_color

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.dims))

    # -- integration ---------------------------------------------------------
    def integrate(self, color_image, depth_image, camera_matrix, cam_to_world_pose,
                  obs_weight: float = 1.0):
        """Fuse a single RGB-D frame (host arrays ok; prefers batched path)."""
        self.integrate_frames(
            colors=np.asarray(color_image, dtype=np.float32)[None],
            depths=np.asarray(depth_image, dtype=np.float32)[None],
            camera_matrix=camera_matrix,
            cam_to_world_poses=np.asarray(cam_to_world_pose, dtype=np.float32)[None],
            obs_weights=np.asarray([obs_weight], dtype=np.float32),
        )

    def integrate_frames(self, colors, depths, camera_matrix, cam_to_world_poses,
                         obs_weights=None):
        """Fuse a stack of frames in one compiled ``lax.scan``.

        :param colors: (N, H, W, 3) RGB (uint8 or float).
        :param depths: (N, H, W) float32 meters (0 = invalid).
        :param camera_matrix: (3, 3) shared intrinsics.
        :param cam_to_world_poses: (N, 4, 4) camera-to-world transforms.
        :param obs_weights: optional (N,) per-frame weights (default 1).
        """
        depths = jnp.asarray(depths, dtype=jnp.float32)
        colors = jnp.asarray(colors, dtype=jnp.float32)
        n, height, width = depths.shape

        if obs_weights is None:
            obs_weights = jnp.ones((n,), dtype=jnp.float32)
        else:
            obs_weights = jnp.asarray(obs_weights, dtype=jnp.float32)

        K = np.asarray(camera_matrix, dtype=np.float32)
        intr = jnp.broadcast_to(
            jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32), (n, 4))

        # World-to-camera transforms for projection.
        world_to_cams = jnp.linalg.inv(jnp.asarray(cam_to_world_poses, dtype=jnp.float32))

        self.state = _integrate_frames_scan(
            self.state, depths, colors, world_to_cams, intr, obs_weights,
            jnp.asarray(self.origin), jnp.float32(self.voxel_size),
            jnp.float32(self.trunc_margin),
            dims=self.dims, height=height, width=width)

        return self

    # -- extraction ----------------------------------------------------------
    def get_volume(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(tsdf (X,Y,Z), weight (X,Y,Z), color (X,Y,Z,3)) as host arrays.

        Colour assembles channel-last on the host — the device keeps planes.
        """
        color = np.stack([np.asarray(self.state.color[ch]) for ch in range(3)],
                         axis=-1)
        return (np.asarray(self.state.tsdf).astype(np.float32),
                np.asarray(self.state.weight).astype(np.float32),
                color.astype(np.float32))

    def get_mesh(self):
        """Extract the isosurface as (vertices, faces, normals, colors).

        Same return contract as the reference's ``TSDFVolume.get_mesh``
        (hive/fusion.py:127), via the TPU marching-tetrahedra extractor.
        """
        from hive_tpu.ops.marching import extract_isosurface

        verts, faces, colors, normals = extract_isosurface(
            self.state.tsdf.astype(jnp.float32), self.state.weight.astype(jnp.float32),
            self.state.color.astype(jnp.float32),
            origin=self.origin, voxel_size=self.voxel_size)

        return verts, faces, normals, colors

    def get_point_cloud(self) -> Tuple[np.ndarray, np.ndarray]:
        """Surface-adjacent voxel centres and their colours (debugging aid)."""
        tsdf, weight, color = self.get_volume()
        near_surface = (np.abs(tsdf) < 0.2) & (weight > 0)
        idx = np.argwhere(near_surface)
        points = self.origin + idx * self.voxel_size
        return points.astype(np.float32), color[near_surface].astype(np.uint8)


def estimate_volume_bounds(depths, camera_matrix, cam_to_world_poses) -> np.ndarray:
    """Union of all view frusta → (3, 2) scene bounds.

    Equivalent of the reference's per-frame ``get_view_frustum`` loop
    (hive/fusion.py:53-61), computed ON THE HOST: the only per-pixel
    quantity needed is each frame's max depth, and shipping whole VGA depth
    stacks to the device for this setup step cost 338 s of a 514 s
    end-to-end run behind the slow host→device tunnel (the frustum-corner
    math itself is 5 points per frame). Prefer
    :func:`estimate_volume_bounds_from_max_depths` when the caller can
    compute per-frame max depths streamingly — stacking a long sequence
    here costs GBs of host memory.
    """
    depths = np.asarray(depths)
    n = depths.shape[0]
    max_depths = depths.reshape(n, -1).max(axis=1)
    return estimate_volume_bounds_from_max_depths(
        max_depths, camera_matrix, cam_to_world_poses,
        image_hw=depths.shape[1:3])


def estimate_volume_bounds_from_max_depths(max_depths, camera_matrix,
                                           cam_to_world_poses,
                                           image_hw=None) -> np.ndarray:
    """Frustum-union bounds from per-frame MAX depths (O(1 frame) memory).

    ``image_hw`` defaults to the sensor size implied by the intrinsics
    (2*cx, 2*cy rounded) when not given — exact for centred principal
    points, which is what every supported dataset provides.
    """
    poses = np.asarray(cam_to_world_poses, dtype=np.float64)
    K = np.asarray(camera_matrix, dtype=np.float64)
    K_inv = np.linalg.inv(K)

    if image_hw is None:
        image_hw = (int(round(2.0 * K[1, 2])), int(round(2.0 * K[0, 2])))
    h, w = image_hw
    n = len(max_depths)
    max_depths = np.asarray(max_depths, dtype=np.float64)

    corners = np.array([[0.0, 0.0, 1.0], [w, 0.0, 1.0], [w, h, 1.0],
                        [0.0, h, 1.0]])
    rays = corners @ K_inv.T                              # (4, 3) at depth 1

    # (N, 5, 3): camera origin + the 4 far-plane corners, in world space.
    far = rays[None] * max_depths[:, None, None]          # (N, 4, 3)
    cam_pts = np.concatenate([np.zeros((n, 1, 3)), far], axis=1)
    world = np.einsum("nij,nkj->nki", poses[:, :3, :3], cam_pts) \
        + poses[:, None, :3, 3]
    pts = world.reshape(-1, 3)

    bounds = np.zeros((3, 2), dtype=np.float32)
    bounds[:, 0] = np.minimum(0.0, pts.min(axis=0))
    bounds[:, 1] = np.maximum(0.0, pts.max(axis=0))

    return bounds
