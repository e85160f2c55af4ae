"""Pallas TSDF integration kernel: N frames fused per voxel-block pass.

Motivation: the XLA scan path (hive_tpu.ops.tsdf) re-reads and re-writes the
entire voxel volume once per frame — for a 38M-voxel volume and 32 frames
that's ~30x more HBM traffic than the data minimum. This kernel inverts the
loop: the grid walks voxel blocks, each block stays resident in VMEM while an
inner `fori_loop` integrates *all* frames into it (depth/colour images are
small enough to sit in VMEM per frame), and the block writes back once.

HBM traffic: volume read+write once + (num_blocks x frames x image bytes),
instead of (frames x volume read+write).

The per-voxel depth lookup is a dynamic gather from the VMEM-resident image.
Colour is packed into one uint32 per pixel (r | g<<8 | b<<16) so each voxel
needs two gathers (depth + packed colour) instead of four.

Status: validated in interpreter mode (tests). On-hardware Mosaic support for
the VMEM gather is probed at runtime by :func:`pallas_supported`; the fusion
path falls back to the XLA kernel when unsupported.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _integrate_kernel(frame_params_ref, depths_ref, colors_ref,
                      tsdf_ref, weight_ref, color_sum_ref,
                      *, num_frames: int, block_x: int, Y: int, Z: int,
                      height: int, width: int, trunc_margin: float):
    """One voxel block (block_x, Y, Z); integrates every frame.

    frame_params: (N, 16) f32 rows =
        [base_xyz (3), step_x_xyz (3), step_y_xyz (3), step_z_xyz (3),
         fx, fy, cx, cy] — the affine voxel-index → camera-space map
        (base is for this block's first voxel; see the caller).
    depths: (N, H, W) f32; colors: (N, H, W) packed uint32 (r|g<<8|b<<16).
    tsdf/weight: (block_x, Y, Z) f32 accumulators (input-output aliased).
    color_sum: (block_x, Y, Z, 3) f32 weighted colour sums.
    """
    bx = pl.program_id(0)

    ix = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 0) \
        + jnp.float32(bx * block_x)
    iy = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 2)

    def integrate_frame(f, carry):
        tsdf, weight, color_sum = carry

        params = frame_params_ref[f]
        base_x, base_y, base_z = params[0], params[1], params[2]
        sx_x, sx_y, sx_z = params[3], params[4], params[5]
        sy_x, sy_y, sy_z = params[6], params[7], params[8]
        sz_x, sz_y, sz_z = params[9], params[10], params[11]
        fx, fy, cx, cy = params[12], params[13], params[14], params[15]

        cam_x = base_x + ix * sx_x + iy * sy_x + iz * sz_x
        cam_y = base_y + ix * sx_y + iy * sy_y + iz * sz_y
        cam_z = base_z + ix * sx_z + iy * sy_z + iz * sz_z

        safe_z = jnp.where(cam_z > 1e-6, cam_z, 1.0)
        u = jnp.round(fx * cam_x / safe_z + cx).astype(jnp.int32)
        v = jnp.round(fy * cam_y / safe_z + cy).astype(jnp.int32)

        in_view = (cam_z > 1e-6) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

        flat = (jnp.clip(v, 0, height - 1) * width
                + jnp.clip(u, 0, width - 1)).reshape(-1)

        # Dynamic gather from the VMEM-resident frame (the Mosaic-support
        # question this kernel is gated on).
        depth_val = jnp.take(depths_ref[f].reshape(-1), flat, mode="clip") \
            .reshape(block_x, Y, Z)
        packed = jnp.take(colors_ref[f].reshape(-1), flat, mode="clip") \
            .reshape(block_x, Y, Z)

        sdf = depth_val - cam_z
        valid = in_view & (depth_val > 0.0) & (sdf >= -trunc_margin)

        dist = jnp.minimum(1.0, sdf / trunc_margin)
        w_obs = jnp.where(valid, 1.0, 0.0)

        tsdf = tsdf + jnp.where(valid, dist, 0.0) * w_obs
        weight = weight + w_obs

        r = (packed & 0xFF).astype(jnp.float32)
        g = ((packed >> 8) & 0xFF).astype(jnp.float32)
        b = ((packed >> 16) & 0xFF).astype(jnp.float32)

        rgb = jnp.stack([r, g, b], axis=-1)
        color_sum = color_sum + rgb * w_obs[..., None]

        return tsdf, weight, color_sum

    # Weighted-sum accumulation (normalised by the caller) keeps the inner
    # loop free of divisions and lets blocks start from zero.
    tsdf0 = jnp.zeros((block_x, Y, Z), dtype=jnp.float32)
    weight0 = jnp.zeros((block_x, Y, Z), dtype=jnp.float32)
    color0 = jnp.zeros((block_x, Y, Z, 3), dtype=jnp.float32)

    tsdf, weight, color_sum = jax.lax.fori_loop(
        0, num_frames, integrate_frame, (tsdf0, weight0, color0))

    tsdf_ref[...] = tsdf
    weight_ref[...] = weight
    color_sum_ref[...] = color_sum


@functools.partial(jax.jit,
                   static_argnames=("dims", "height", "width", "block_x", "interpret",
                                    "trunc_margin"))
def integrate_frames_pallas(depths, packed_colors, frame_params, *,
                            dims: Tuple[int, int, int], height: int, width: int,
                            trunc_margin: float, block_x: int = 8,
                            interpret: bool = False):
    """Integrate a whole frame stack into fresh (sum, weight) voxel buffers.

    :param depths: (N, H, W) float32.
    :param packed_colors: (N, H, W) uint32, r | g<<8 | b<<16.
    :param frame_params: (N, 16) float32 (see kernel docstring; base is for
        voxel (0,0,0) — per-block offsets are applied via the iota).
    :return: (tsdf_sum, weight, color_sum) — finalise with
        ``tsdf_sum / max(weight, 1)`` etc.
    """
    X, Y, Z = dims
    num_frames = depths.shape[0]

    grid = (X // block_x,)

    kernel = functools.partial(
        _integrate_kernel, num_frames=num_frames, block_x=block_x, Y=Y, Z=Z,
        height=height, width=width, trunc_margin=float(trunc_margin))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # frame_params (small)
            pl.BlockSpec(memory_space=pl.ANY),   # depths
            pl.BlockSpec(memory_space=pl.ANY),   # packed colors
        ],
        out_specs=(
            pl.BlockSpec((block_x, Y, Z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_x, Y, Z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_x, Y, Z, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
            jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
            jax.ShapeDtypeStruct((X, Y, Z, 3), jnp.float32),
        ),
        interpret=interpret,
    )(frame_params, depths, packed_colors)


def make_frame_params(camera_matrix: np.ndarray, world_to_cams: np.ndarray,
                      origin: np.ndarray, voxel_size: float) -> np.ndarray:
    """Precompute per-frame affine voxel-index → camera-space parameters."""
    K = np.asarray(camera_matrix, dtype=np.float32)
    world_to_cams = np.asarray(world_to_cams, dtype=np.float32)
    n = len(world_to_cams)

    params = np.zeros((n, 16), dtype=np.float32)

    for f in range(n):
        R = world_to_cams[f, :3, :3]
        t = world_to_cams[f, :3, 3]

        params[f, 0:3] = R @ np.asarray(origin, dtype=np.float32) + t
        params[f, 3:6] = R[:, 0] * voxel_size   # step per +1 voxel index x
        params[f, 6:9] = R[:, 1] * voxel_size
        params[f, 9:12] = R[:, 2] * voxel_size
        params[f, 12:16] = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]

    return params


def pack_colors(colors: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 RGB → (N, H, W) uint32 r | g<<8 | b<<16."""
    colors = np.asarray(colors, dtype=np.uint32)
    return (colors[..., 0] | (colors[..., 1] << 8) | (colors[..., 2] << 16))


_pallas_supported: Optional[bool] = None


def pallas_supported() -> bool:
    """Probe whether the kernel compiles+runs on the current backend.

    Cached; returns False on CPU (no Mosaic) and on backends lacking the
    dynamic VMEM gather.
    """
    global _pallas_supported

    if _pallas_supported is not None:
        return _pallas_supported

    try:
        import jax

        if jax.default_backend() not in ("tpu",):
            _pallas_supported = False
            return False

        depths = jnp.ones((1, 8, 16), dtype=jnp.float32)
        packed = jnp.zeros((1, 8, 16), dtype=jnp.uint32)
        params = jnp.asarray(make_frame_params(
            np.eye(3, dtype=np.float32), np.eye(4, dtype=np.float32)[None],
            np.zeros(3, dtype=np.float32), 0.1))

        out = integrate_frames_pallas(depths, packed, params, dims=(8, 8, 16),
                                      height=8, width=16, trunc_margin=0.5)
        jax.block_until_ready(out)
        _pallas_supported = True
    except Exception:  # pragma: no cover - backend specific
        _pallas_supported = False

    return _pallas_supported
