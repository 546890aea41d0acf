from fupi_ray.ops.compact import compact
from fupi_ray.ops.cluster import cluster
from fupi_ray.ops.evolve import add_column, drop_column
from fupi_ray.ops.expire import expire_snapshots
from fupi_ray.ops.merge import merge_into

__all__ = [
    "compact",
    "cluster",
    "add_column",
    "drop_column",
    "expire_snapshots",
    "merge_into",
]
