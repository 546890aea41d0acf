"""Authoritative table schema and validation helpers.

The reference declares fixed Arrow schemas for its two tables
(``fupi/utils.py:18-36``); ours is the tokenized-sequence analogue from
``BASELINE.json.input_hint``: ``doc_id`` + one large list column +
scalar metadata.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# The primary table every maintenance op runs over.
SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

SEQUENCE_COLUMNS = tuple(SEQUENCES_SCHEMA.names)


def _unwrap_tensor(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Ray converts ndarray-of-ndarray pandas columns into its
    variable-shaped tensor extension type; unwrap back to a plain list
    array (storage field 0 is the flat large_list of values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        storage = col.storage
        if pa.types.is_struct(storage.type):
            col = storage.field(0)
        else:
            col = storage
    return col


def normalize_batch(
    batch: pa.Table,
    schema: pa.Schema | None = None,
    fill_missing: dict | None = None,
    drop_extra: bool = False,
) -> pa.Table:
    """Project a batch to the target schema's column order / types.

    Mirrors the reference's declared-schema writes (``fupi/utils.py:39-49``
    always writes with an explicit schema, never inferred). Handles
    batches that round-tripped through pandas (list columns come back
    as Ray tensor extension arrays).

    ``schema`` defaults to the canonical ``SEQUENCES_SCHEMA``;
    maintenance ops pass the TABLE's manifest schema so user tables
    with extra columns round-trip unchanged. A table column missing
    from the batch raises — unless ``fill_missing`` explicitly allows
    it (schema evolution: MERGE sources written before an add-column
    get the column's default / null; the key column is never
    fillable). Batch columns outside the schema are dropped only if
    they are internal (``_``-prefixed) — a user column the table does
    not know is an error, never a silent drop.
    """
    schema = SEQUENCES_SCHEMA if schema is None else schema
    fill_missing = fill_missing or {}
    missing = [f.name for f in schema if f.name not in batch.column_names]
    hard_missing = [c for c in missing if c not in fill_missing]
    if hard_missing:
        raise ValueError(f"batch is missing table columns {hard_missing}")
    for c in missing:
        typ = schema.field(c).type
        dflt = fill_missing[c]
        if dflt is None:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, typ))
        else:
            batch = batch.append_column(
                c, pa.array([dflt] * batch.num_rows, type=typ)
            )
    extra = [
        n for n in batch.column_names if schema.get_field_index(n) < 0 and not n.startswith("_")
    ]
    if extra and not drop_extra:
        raise ValueError(
            f"batch has columns {extra} not in the table schema — "
            "evolve the table schema first instead of silently dropping data"
        )
    cols = []
    for f in schema:
        col = _unwrap_tensor(batch.column(f.name))
        if col.type != f.type:
            col = pc.cast(col, f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def validate_batch(batch: pa.Table) -> pa.Table:
    """Assert the per-row invariant ``n_tok == len(tokens)``.

    This is the engine's standing invariant from
    ``BASELINE.json.input_hint`` (analogue of the reference length
    filter ``fupi/utils.py:177``); raises on violation rather than
    silently dropping, because a violation means corrupt input.
    """
    lengths = pc.list_value_length(batch["tokens"])
    ok = pc.equal(pc.cast(lengths, pa.int32()), batch["n_tok"])
    if not pc.all(ok).as_py():
        bad = batch.filter(pc.invert(pc.fill_null(ok, False)))
        ids = bad["doc_id"].slice(0, 5).to_pylist()
        raise ValueError(f"n_tok != len(tokens) for {bad.num_rows} rows, e.g. {ids}")
    return batch
