"""Device-mesh / sharding layer (ICI collectives)."""

from hive_tpu.parallel.mesh import (get_device_mesh, shard_batch, shard_volume,
                                    replicate)
from hive_tpu.parallel.fusion import (shard_sparse_state,
                                      integrate_frames_sharded)
