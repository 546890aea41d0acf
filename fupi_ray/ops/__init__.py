from fupi_ray.ops.analyze import (
    column_heavy_hitters,
    column_ndv,
    column_quantiles,
    ensure_hh_sketches,
    ensure_ndv_sketches,
    ensure_quantile_sketches,
    estimate_rows,
)
from fupi_ray.ops.bucket import BucketLayoutError, bucket_join, bucket_table, read_layout
from fupi_ray.ops.constraints import (
    ConstraintViolation,
    drop_constraints,
    read_constraints,
    set_constraints,
)
from fupi_ray.ops.changelog import apply_changelog, changelog
from fupi_ray.ops.compact import compact
from fupi_ray.ops.cluster import cluster
from fupi_ray.ops.evolve import add_column, drop_column, rename_column, widen_column
from fupi_ray.ops.export import export_training_shards, read_export_manifest
from fupi_ray.ops.expire import expire_snapshots
from fupi_ray.ops.fork import (
    ForkConflict,
    drop_fork,
    fork_base_version,
    fork_source,
    fork_table,
    merge_fork,
)
from fupi_ray.ops.fsck import check_table
from fupi_ray.ops.ingest import current_ledger, ingest_files
from fupi_ray.ops.tokindex import ensure_token_blooms, keyword_lookup
from fupi_ray.ops.maintain import maintain
from fupi_ray.ops.matview import create_matview, matview_watermark, refresh_matview
from fupi_ray.ops.decontaminate import decontaminate_table, eval_window_hashes
from fupi_ray.ops.dedupdocs import dedup_documents
from fupi_ray.ops.merge import insert_missing, merge_into
from fupi_ray.ops.mutate import delete_where, rollback, update_where
from fupi_ray.ops.windowdedup import dedup_token_windows
from fupi_ray.ops.stage import (
    abort_stage,
    list_stages,
    publish_stage,
    stage_append,
    staged_scan,
)

__all__ = [
    "column_heavy_hitters",
    "column_ndv",
    "column_quantiles",
    "ensure_hh_sketches",
    "ensure_ndv_sketches",
    "ensure_quantile_sketches",
    "estimate_rows",
    "BucketLayoutError",
    "bucket_join",
    "bucket_table",
    "read_layout",
    "ConstraintViolation",
    "drop_constraints",
    "read_constraints",
    "set_constraints",
    "abort_stage",
    "export_training_shards",
    "read_export_manifest",
    "list_stages",
    "publish_stage",
    "stage_append",
    "staged_scan",
    "apply_changelog",
    "changelog",
    "compact",
    "cluster",
    "create_matview",
    "matview_watermark",
    "refresh_matview",
    "drop_fork",
    "fork_base_version",
    "fork_source",
    "fork_table",
    "ForkConflict",
    "merge_fork",
    "add_column",
    "drop_column",
    "rename_column",
    "widen_column",
    "dedup_token_windows",
    "check_table",
    "current_ledger",
    "ensure_token_blooms",
    "ingest_files",
    "keyword_lookup",
    "decontaminate_table",
    "dedup_documents",
    "delete_where",
    "eval_window_hashes",
    "expire_snapshots",
    "maintain",
    "insert_missing",
    "merge_into",
    "rollback",
    "update_where",
]
