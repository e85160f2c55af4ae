"""hive_tpu — a TPU-native framework for converting RGB(-D) video into 3D mesh video.

Re-designed from scratch for TPU (JAX/XLA/Pallas) with the capabilities of the
reference HIVE project (see SURVEY.md): per-frame textured foreground meshes of
dynamic objects plus a static TSDF-fused background, exported as glTF for a
WebXR viewer.

Layering (bottom-up):
    core/       jittable geometry transforms (quaternions, SE(3), projection)
    ops/        Pallas/XLA compute kernels (TSDF integration, marching cubes, resize)
    meshing/    host+device mesh processing (triangulation, decimation, glTF export)
    models/     Flax models (DPT depth, segmentation, LaMa inpainting)
    parallel/   device-mesh / sharding layer (ICI collectives)
    data        dataset format, adaptors and loaders
    top-level   options, pipeline, pose optimisation, CLI
"""

__version__ = "0.1.0"
