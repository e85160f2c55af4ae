"""Triangle-mesh data structures and processing (host + device)."""

from hive_tpu.meshing.mesh import Scene, TriangleMesh
