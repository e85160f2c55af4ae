"""Pallas TSDF integration kernel: N frames fused per voxel-block pass.

Motivation: the XLA scan path (hive_tpu.ops.tsdf) is bottlenecked by XLA's
per-element gather lowering on TPU (~15 ns per voxel — measured 0.067 G
voxel-updates/s on v5e) and re-reads the whole voxel volume once per frame.
This kernel inverts the loop: the grid walks voxel blocks, each block stays in
VMEM while an inner `fori_loop` integrates *all* frames into it; each frame's
depth + packed-colour images are DMA'd into double-buffered VMEM scratch so
the copy for frame f+1 overlaps the maths for frame f; the block writes back
once.

The per-voxel depth lookup is a dynamic gather from the VMEM-resident image
(Mosaic's VMEM gather, not XLA's HBM gather loop). Colour is packed into one
uint32 per pixel (r | g<<8 | b<<16): two gathers per voxel per frame.

Outputs are weighted sums (tsdf_sum, weight, r/g/b sums) — finalise with
``sum / max(weight, eps)``; weight == 0 marks never-observed voxels.

Status: validated in interpreter mode (tests); :func:`pallas_supported`
probes whether the current backend compiles+runs the kernel, and the fusion
path falls back to the XLA kernel when it does not.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _integrate_kernel(frame_params_ref, depths_hbm, colors_hbm,
                      tsdf_ref, weight_ref, r_ref, g_ref, b_ref,
                      depth_scratch, color_scratch, sems,
                      *, num_frames: int, block_x: int, Y: int, Z: int,
                      height: int, width: int, trunc_margin: float):
    """One voxel block (block_x, Y, Z); integrates every frame.

    frame_params (VMEM): (N, 16) f32 rows =
        [base_xyz (3), step_x_xyz (3), step_y_xyz (3), step_z_xyz (3),
         fx, fy, cx, cy] — the affine voxel-index → camera-space map for
        voxel (0, 0, 0); the block's x-offset is added via the iota.
    depths/colors (HBM): (N, H, W) f32 / packed uint32.
    depth/color_scratch (VMEM): (2, H, W) double buffers.
    sems: (2, 2) DMA semaphores [stream, slot].
    """
    bx = pl.program_id(0)

    ix = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 0) \
        + jnp.float32(bx * block_x)
    iy = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (block_x, Y, Z), 2)

    def depth_dma(slot, f):
        return pltpu.make_async_copy(depths_hbm.at[f], depth_scratch.at[slot],
                                     sems.at[0, slot])

    def color_dma(slot, f):
        return pltpu.make_async_copy(colors_hbm.at[f], color_scratch.at[slot],
                                     sems.at[1, slot])

    depth_dma(0, 0).start()
    color_dma(0, 0).start()

    def integrate_frame(f, carry):
        tsdf, weight, r_sum, g_sum, b_sum = carry

        slot = jax.lax.rem(f, 2)
        next_slot = jax.lax.rem(f + 1, 2)

        # Prefetch the next frame while this one computes.
        @pl.when(f + 1 < num_frames)
        def _():
            depth_dma(next_slot, f + 1).start()
            color_dma(next_slot, f + 1).start()

        depth_dma(slot, f).wait()
        color_dma(slot, f).wait()

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

        # Dynamic gather from the VMEM-resident frame.
        depth_img = depth_scratch[slot].reshape(-1)
        packed_img = color_scratch[slot].reshape(-1)

        depth_val = jnp.take(depth_img, flat, mode="clip").reshape(block_x, Y, Z)
        packed = jnp.take(packed_img, flat, mode="clip").reshape(block_x, Y, Z)

        sdf = depth_val - cam_z
        valid = in_view & (depth_val > 0.0) & (sdf >= -trunc_margin)

        dist = jnp.minimum(1.0, sdf / trunc_margin)
        w_obs = jnp.where(valid, 1.0, 0.0)

        tsdf = tsdf + jnp.where(valid, dist, 0.0) * w_obs
        weight = weight + w_obs

        r_sum = r_sum + (packed & 0xFF).astype(jnp.float32) * w_obs
        g_sum = g_sum + ((packed >> 8) & 0xFF).astype(jnp.float32) * w_obs
        b_sum = b_sum + ((packed >> 16) & 0xFF).astype(jnp.float32) * w_obs

        return tsdf, weight, r_sum, g_sum, b_sum

    zeros = jnp.zeros((block_x, Y, Z), dtype=jnp.float32)

    tsdf, weight, r_sum, g_sum, b_sum = jax.lax.fori_loop(
        0, num_frames, integrate_frame, (zeros, zeros, zeros, zeros, zeros))

    tsdf_ref[...] = tsdf
    weight_ref[...] = weight
    r_ref[...] = r_sum
    g_ref[...] = g_sum
    b_ref[...] = b_sum


@functools.partial(jax.jit,
                   static_argnames=("dims", "height", "width", "block_x", "interpret",
                                    "trunc_margin"))
def integrate_frames_pallas(depths, packed_colors, frame_params, *,
                            dims: Tuple[int, int, int], height: int, width: int,
                            trunc_margin: float, block_x: int = 4,
                            interpret: bool = False):
    """Integrate a whole frame stack into fresh (sum, weight) voxel buffers.

    :param depths: (N, H, W) float32.
    :param packed_colors: (N, H, W) uint32, r | g<<8 | b<<16.
    :param frame_params: (N, 16) float32 (see kernel docstring).
    :return: (tsdf_sum, weight, r_sum, g_sum, b_sum), each (X, Y, Z) float32.
    """
    X, Y, Z = dims
    num_frames = depths.shape[0]

    grid = (X // block_x,)

    kernel = functools.partial(
        _integrate_kernel, num_frames=num_frames, block_x=block_x, Y=Y, Z=Z,
        height=height, width=width, trunc_margin=float(trunc_margin))

    block = pl.BlockSpec((block_x, Y, Z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((X, Y, Z), jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # frame_params (small)
            pl.BlockSpec(memory_space=pl.ANY),      # depths (DMA'd per frame)
            pl.BlockSpec(memory_space=pl.ANY),      # packed colors
        ],
        out_specs=(block, block, block, block, block),
        out_shape=(out_shape,) * 5,
        scratch_shapes=[
            pltpu.VMEM((2, height, width), jnp.float32),
            pltpu.VMEM((2, height, width), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
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

    Cached; False on CPU (no Mosaic) and on backends lacking the dynamic VMEM
    gather.
    """
    global _pallas_supported

    if _pallas_supported is not None:
        return _pallas_supported

    try:
        import jax

        if jax.default_backend() not in ("tpu",):
            _pallas_supported = False
            return False

        depths = jnp.ones((2, 16, 128), dtype=jnp.float32)
        packed = jnp.zeros((2, 16, 128), dtype=jnp.uint32)
        params = jnp.asarray(make_frame_params(
            np.eye(3, dtype=np.float32),
            np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
            np.zeros(3, dtype=np.float32), 0.1))

        out = integrate_frames_pallas(depths, packed, params, dims=(8, 8, 128),
                                      height=16, width=128, trunc_margin=0.5,
                                      block_x=4)
        jax.block_until_ready(out)
        _pallas_supported = True
    except Exception as exc:  # pragma: no cover - backend specific
        import logging

        logging.debug(f"Pallas TSDF kernel unavailable: {exc}")
        _pallas_supported = False

    return _pallas_supported
