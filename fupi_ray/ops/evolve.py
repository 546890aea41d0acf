"""Schema evolution: metadata-only column add/drop.

The reference rebuilds its tables wholesale when the shape changes
(``create_table(mode='overwrite')``, fupi/utils.py:39-49). A 100 TB
table cannot be rewritten to gain a column, so evolution here is
Iceberg-style METADATA-ONLY: the manifest's declared schema changes,
no fragment is touched, and the scan path reconciles old fragments —
missing columns come back as the recorded default (or null), dropped
columns are pruned at the read. Rewrites happen only when compaction /
clustering next touches a fragment anyway.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from fupi_ray import manifest as mf
from fupi_ray.table import Table


class SchemaEvolutionError(RuntimeError):
    pass


def add_column(
    table: Table,
    name: str,
    col_type: pa.DataType | str,
    default: Any = None,
) -> int:
    """Add a column to the table's declared schema; returns the new
    version. ``default`` (optional) is what scans return for rows of
    fragments written before the column existed; None means null.
    O(1): no data is read or written."""
    parent = table.latest_version()
    m = table.manifest(parent)
    if name in m.schema_names:
        raise SchemaEvolutionError(f"column {name!r} already exists")
    typ = mf.type_from_str(col_type) if isinstance(col_type, str) else col_type
    # round-trip guard: the manifest stores display form; refuse types
    # the parser cannot bring back (the scan path needs them)
    mf.type_from_str(str(typ))
    schema = pa.schema(
        [(n, mf.type_from_str(t)) for n, t in zip(m.schema_names, m.schema_types)]
        + [(name, typ)]
    )
    # record the column even with default=None: presence in
    # column_defaults is what marks it EVOLUTION-ADDED — only such
    # columns may be null/default-padded when a MERGE source lacks
    # them; a source missing a core column must still raise
    defaults = dict(m.column_defaults)
    defaults[name] = default
    return table.commit_fragment_swap(
        set(),
        [],
        operation="add-column",
        expected_parent=parent,
        properties={"column": name, "type": str(typ), "default": default},
        schema_override=schema,
        column_defaults=defaults,
    )


def drop_column(table: Table, name: str) -> int:
    """Drop a column from the declared schema (data stays in the files
    until those fragments are next rewritten; scans prune it). The key
    column ``doc_id`` cannot be dropped."""
    parent = table.latest_version()
    m = table.manifest(parent)
    if name == "doc_id":
        raise SchemaEvolutionError("cannot drop the key column doc_id")
    if name not in m.schema_names:
        raise SchemaEvolutionError(f"no column {name!r} in table schema")
    schema = pa.schema(
        [
            (n, mf.type_from_str(t))
            for n, t in zip(m.schema_names, m.schema_types)
            if n != name
        ]
    )
    defaults = {k: v for k, v in m.column_defaults.items() if k != name}
    return table.commit_fragment_swap(
        set(),
        [],
        operation="drop-column",
        expected_parent=parent,
        properties={"column": name},
        schema_override=schema,
        column_defaults=defaults,
    )
