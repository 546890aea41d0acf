from fupi_ray.ops.compact import compact
from fupi_ray.ops.cluster import cluster
from fupi_ray.ops.expire import expire_snapshots
from fupi_ray.ops.merge import merge_into

__all__ = ["compact", "cluster", "expire_snapshots", "merge_into"]
