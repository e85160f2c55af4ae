"""Flax models: DPT depth estimation, person segmentation, LaMa inpainting."""
