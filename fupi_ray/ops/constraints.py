"""Commit-time constraints (Delta-style invariants / CHECK constraints).

The reference trusts its ingest code to produce valid rows (LanceDB
enforces nothing beyond the Arrow schema; a bad batch lands silently,
fupi/embedders.py:124-125). At 100 TB a silently-ingested bad shard is
found weeks later by a training job — the right failure point is the
COMMIT: validation runs as a zero-copy vectorized pass inside the
write pipeline itself (no extra scan), and a violating batch fails the
Ray task before any manifest mutates, so the table never holds a row
that breaks a declared invariant.

Two forms, both persisted as a manifest sidecar (like pins — carried
forward across commits, not per-manifest properties):

- ``{"col": c, "not_null": true}``
- ``{"col": c, "op": op, "value": v}`` — a CHECK that every row
  satisfies the predicate (same op set as scans: == != < <= > >=
  between in), evaluated with the same Arrow kernels the predicate
  mask uses.

Enforced where NEW VALUES enter the table: ``commit_append``,
``commit_overwrite``, MERGE source inserts, UPDATE assignments.
Maintenance rewrites (compact / cluster / bucket / COW copies) move
existing validated rows and are deliberately not re-checked.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from fupi_ray import manifest as mf
from fupi_ray.state import fs as _fs


class ConstraintViolation(ValueError):
    pass


_OPS = ("==", "=", "!=", "<", "<=", ">", ">=", "between", "in")


def _path(table_dir: str) -> str:
    return _fs.join(table_dir, "manifest", "constraints.json")


def read_constraints(table_dir: str) -> list[dict]:
    p = _path(table_dir)
    if not _fs.exists(p):
        return []
    return json.loads(_fs.read_text(p))


def write_constraints(table_dir: str, constraints: list[dict]) -> None:
    for c in constraints:
        if "col" not in c:
            raise ValueError(f"constraint missing 'col': {c}")
        if not c.get("not_null") and c.get("op") not in _OPS:
            raise ValueError(f"constraint needs not_null or a valid op: {c}")
    mf._atomic_write(_path(table_dir), json.dumps(constraints))


def check_batch(
    batch: pa.Table, constraints: list[dict], defaults: dict | None = None
) -> pa.Table:
    """Raise ConstraintViolation if any row of the batch breaks any
    constraint; return the batch unchanged otherwise (pass-through for
    map_batches — zero-copy, the columns are only read). ``defaults``
    is the table's column_defaults: a column missing from the batch is
    materialized from it downstream, so the CHECK runs against the
    default value, and not-null passes when the default is non-null."""
    defaults = defaults or {}
    for c in constraints:
        col = c["col"]
        if col not in batch.column_names:
            # the write path's schema normalization fills this column
            # from the table default — validate what will actually land
            dflt = defaults.get(col)
            if c.get("not_null"):
                if dflt is None:
                    raise ConstraintViolation(
                        f"not-null constraint on {col!r}: column missing "
                        "from batch and the table default is null"
                    )
                continue
            if dflt is not None and batch.num_rows:
                probe = pa.table({col: pa.array([dflt])})
                ok = mf.predicate_mask(probe, [(col, c["op"], c["value"])])
                if not ok[0].as_py():
                    raise ConstraintViolation(
                        f"check constraint {col!r} {c['op']} {c['value']!r}: "
                        f"column missing from batch and default {dflt!r} violates it"
                    )
            continue
        arr = batch[col]
        if c.get("not_null"):
            nulls = arr.null_count
            if nulls:
                raise ConstraintViolation(
                    f"not-null constraint on {col!r}: {nulls} null row(s)"
                )
            continue
        ok = mf.predicate_mask(batch, [(col, c["op"], c["value"])])
        bad = batch.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py()
        if bad:
            first = batch.filter(pc.invert(ok))[col][0].as_py()
            raise ConstraintViolation(
                f"check constraint {col!r} {c['op']} {c['value']!r}: "
                f"{bad} violating row(s), first value {first!r}"
            )
    return batch


class ConstraintChecker:
    """Picklable map_batches pass-through validator."""

    def __init__(self, constraints: list[dict], defaults: dict | None = None):
        self.constraints = constraints
        self.defaults = defaults or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return check_batch(batch, self.constraints, self.defaults)


def set_constraints(table, constraints: list[dict], verify_existing: bool = True) -> int:
    """Declare the table's invariants; by default the EXISTING data is
    verified first (one distributed column-pruned pass — a constraint
    the current rows already break would make every future commit
    fail). Returns the number of rows verified."""
    m = table.manifest()
    schema_cols = set(m.schema_names or [])
    missing = sorted({c["col"] for c in constraints} - schema_cols)
    if missing and schema_cols:
        raise ValueError(f"constraint column(s) not in table schema: {missing}")
    # write-then-verify, not verify-then-write: the sidecar lands FIRST
    # so any append/merge that starts during the validation scan is
    # already checked by its own write pipeline (the verify-then-write
    # order has a window where a violating concurrent write slips in
    # unvalidated). If the EXISTING data fails, the previous constraint
    # set is restored before re-raising — a transiently-stricter window
    # is benign; a permanently-unenforced one is not.
    previous = read_constraints(table.table_dir)
    write_constraints(table.table_dir, constraints)
    checked = 0
    if verify_existing and m.fragments:
        cols = sorted({c["col"] for c in constraints})
        try:
            # count() drives the full column-pruned validation pass;
            # a violation raises inside a read task
            checked = (
                table.scan(columns=cols)
                .map_batches(
                    ConstraintChecker(constraints, dict(m.column_defaults or {})),
                    batch_format="pyarrow",
                )
                .count()
            )
        except Exception:
            if previous:
                write_constraints(table.table_dir, previous)
            else:
                drop_constraints(table)
            raise
    return checked


def drop_constraints(table) -> None:
    p = _path(table.table_dir)
    if _fs.exists(p):
        _fs.rm(p)
