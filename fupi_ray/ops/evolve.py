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


# doc_id is the merge/dedup key, n_tok the token-accounting column,
# source a Z-order clustering dimension — internal ops and worker
# tasks address all three by name, so they keep their names for the
# table's lifetime. Payload columns (tokens, user-added) are free.
RESERVED_COLUMNS = ("doc_id", "n_tok", "source")

# lossless widenings (Iceberg's promotion rules: int -> long,
# float -> double, plus the unsigned chain), keyed by display form
_WIDEN_OK = {
    "int8": {"int16", "int32", "int64"},
    "int16": {"int32", "int64"},
    "int32": {"int64"},
    "uint8": {"uint16", "uint32", "uint64"},
    "uint16": {"uint32", "uint64"},
    "uint32": {"uint64"},
    "halffloat": {"float", "double"},
    "float": {"double"},
}


def rename_column(table: Table, old: str, new: str) -> int:
    """Rename a column — metadata-only, O(1), Iceberg-style: the field
    id MOVES to the new name, so every existing fragment keeps serving
    the column under its original file name (scans reconcile by id and
    emit the declared name) until the fragment is next rewritten.
    Old snapshots keep the old name (time travel reads their own
    manifest's schema). The engine-reserved columns (``doc_id`` key,
    ``n_tok`` token accounting) cannot be renamed — internal ops
    address them by name inside worker tasks."""
    parent = table.latest_version()
    m = table.manifest(parent)
    if old in RESERVED_COLUMNS:
        raise SchemaEvolutionError(f"cannot rename reserved column {old!r}")
    if old not in m.schema_names:
        raise SchemaEvolutionError(f"no column {old!r} in table schema")
    if new in m.schema_names:
        raise SchemaEvolutionError(f"column {new!r} already exists")
    if not new or new.startswith("_"):
        raise SchemaEvolutionError(f"invalid column name {new!r}")
    legacy = [f.path for f in m.fragments if f.col_ids is None and old in (f.cols or [old])]
    if legacy:
        raise SchemaEvolutionError(
            "rename needs field-id-stamped fragments; compact the table "
            f"first ({len(legacy)} legacy fragments, e.g. {legacy[0]})"
        )
    schema = pa.schema(
        [
            (new if n == old else n, mf.type_from_str(t))
            for n, t in zip(m.schema_names, m.schema_types)
        ]
    )
    defaults = {
        (new if k == old else k): v for k, v in m.column_defaults.items()
    }
    ids = dict(m.column_ids)
    ids[new] = ids.pop(old)
    return table.commit_fragment_swap(
        set(),
        [],
        operation="rename-column",
        expected_parent=parent,
        properties={"from": old, "to": new, "field_id": ids[new]},
        schema_override=schema,
        column_defaults=defaults,
        column_ids_override=ids,
    )


def widen_column(table: Table, name: str, new_type: pa.DataType | str) -> int:
    """Widen a column's type (int -> wider int / long, float ->
    double) — metadata-only: no data file is touched. Every live
    fragment meta is stamped with its current PHYSICAL type so scans
    know to cast pre-widen batches; fragments written (or compacted)
    afterwards carry the wide type natively. Narrowing or any lossy
    change is refused."""
    import dataclasses

    parent = table.latest_version()
    m = table.manifest(parent)
    if name not in m.schema_names:
        raise SchemaEvolutionError(f"no column {name!r} in table schema")
    old_t = m.schema_types[m.schema_names.index(name)]
    typ = mf.type_from_str(new_type) if isinstance(new_type, str) else new_type
    mf.type_from_str(str(typ))  # round-trip guard, as in add_column
    new_t = str(typ)
    if new_t == old_t:
        return parent
    if new_t not in _WIDEN_OK.get(old_t, set()):
        raise SchemaEvolutionError(
            f"cannot widen {name!r} from {old_t} to {new_t} "
            f"(allowed: {sorted(_WIDEN_OK.get(old_t, set()))})"
        )
    schema = pa.schema(
        [
            (n, typ if n == name else mf.type_from_str(t))
            for n, t in zip(m.schema_names, m.schema_types)
        ]
    )
    removed: set[str] = set()
    restamped = []
    for f in m.fragments:
        phys = f.physical_name(name, m.column_ids)
        if phys is None or (f.col_types or {}).get(phys):
            continue  # lacks the column, or already stamped (earlier widen)
        removed.add(f.path)
        restamped.append(
            dataclasses.replace(
                f, col_types={**(f.col_types or {}), phys: old_t}
            )
        )
    return table.commit_fragment_swap(
        removed,
        restamped,
        operation="widen-column",
        expected_parent=parent,
        properties={"column": name, "from": old_t, "to": new_t},
        schema_override=schema,
        column_defaults=dict(m.column_defaults),
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
