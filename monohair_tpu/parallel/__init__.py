"""Device-mesh sharding helpers: point/pixel batch axes sharded over ICI."""

from .sharding import data_mesh, shard_batch, replicate  # noqa: F401
