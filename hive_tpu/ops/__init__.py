"""Device compute kernels: TSDF integration, isosurface extraction, resize."""
