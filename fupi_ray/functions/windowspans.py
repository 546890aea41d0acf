"""Shared group functions for duplicated-window removal.

Both duplicated-window removers — the documents-table query
(``pipelines/queries.py q_dedup_substring_rm``, char windows, int64
doc ids) and the sequences-table op (``ops/windowdedup.py``, token
windows, string doc ids) — run the same two exchanges after window
extraction: pick survivors per exact window bytes inside each
window-hash bucket, then assemble per-doc span blobs inside each
doc-hash bucket. One implementation, parameterized by the id type and
the duplication threshold, so fixes (survivor ordering, the
typed-empty-block workaround below) land once.

Group functions take Arrow tables (``map_groups(...,
batch_format="pyarrow")``): the sort is Arrow's C++ multi-column
``sort_by`` (binary window bytes included) and the group math is
boundary flags from C-level adjacent ``not_equal`` — no per-group
pandas conversion or object-dtype comparisons anywhere on the hot
exchange. Outputs are TYPED Arrow tables: a 0-row object-dtype block
(most buckets, when duplication is sparse) trips Ray's block-size
estimator into per-block error logs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fupi_ray.functions.hashing import mix64, stable_hash


def row_hash64(wins: np.ndarray) -> np.ndarray:
    """Full 64-bit hash per window-byte row: fold the 8-byte words of
    each row through mix64 (vectorized over rows; width/2 passes for
    int32 token windows). Odd byte-widths pay one zero-pad copy so the
    uint64 view is legal (padding is constant per row — equal windows
    still collide). Both removers derive their shuffle bucket AND the
    two-phase candidate filter from this one hash, so the phases can
    never disagree."""
    m, wb = wins.shape
    if wb % 8:
        padded = np.zeros((m, wb + (8 - wb % 8)), dtype=np.uint8)
        padded[:, :wb] = wins
        wins = padded
    w64 = np.ascontiguousarray(wins).view(np.uint64)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(w64.shape[1]):
        h = mix64(h ^ w64[:, j])
    return h


def _adjacent_change(arr: pa.Array, n: int) -> np.ndarray:
    """Boolean row-change flags on a sorted column: flag[0] is True,
    flag[i] = arr[i] != arr[i-1] (Arrow C++ kernel, works for binary,
    string and integer columns alike)."""
    flags = np.ones(n, dtype=bool)
    if n > 1:
        flags[1:] = pc.not_equal(arr.slice(1), arr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    return flags


def choose_removals_fn(min_dups: int, num_buckets: int, id_type: pa.DataType):
    """Per window-hash bucket: sub-group on the exact window bytes
    (a hash collision only CO-LOCATES two windows, never merges them);
    a window spanning >= ``min_dups`` distinct docs loses every
    instance but the ``(doc_id, pos)`` minimum. Emits the removals
    re-keyed by ``stable_hash(doc_id) % num_buckets``."""

    empty = pa.table(
        {
            "doc_id": pa.array([], id_type),
            "pos": pa.array([], pa.int64()),
            "dbkt": pa.array([], pa.int64()),
        }
    )

    def choose_removals(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        gg = g.sort_by(
            [("win", "ascending"), ("doc_id", "ascending"), ("pos", "ascending")]
        )
        win = gg["win"].combine_chunks()
        doc = gg["doc_id"].combine_chunks()
        first = _adjacent_change(win, n)
        # distinct docs per window: count rows where either the window
        # or (within a window run) the doc changes, bucketed by window
        new_doc = first | _adjacent_change(doc, n)
        grp = np.cumsum(first) - 1
        ndocs = np.bincount(grp[new_doc])[grp]
        rm = (ndocs >= min_dups) & ~first
        if not rm.any():
            return empty
        sel = pa.array(rm)
        ids = doc.filter(sel)
        if ids.type != id_type:
            ids = ids.cast(id_type)
        return pa.table(
            {
                "doc_id": ids,
                "pos": gg["pos"].combine_chunks().filter(sel),
                "dbkt": pa.array(
                    (stable_hash(ids) % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
        )

    return choose_removals


def spans_per_bucket_fn(id_type: pa.DataType):
    """Per doc-hash bucket: one ``(doc_id, starts)`` row per affected
    doc, span starts packed ascending as little-endian int64 bytes
    (join payloads can't be list<int64>; the blob decodes back into
    one flat numpy view per block). Boundary scan + one C-level
    ``tobytes`` per AFFECTED doc, not per span."""

    def spans_per_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], id_type), "starts": pa.array([], pa.binary())}
            )
        gg = g.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        pos = gg["pos"].to_numpy(zero_copy_only=False).astype("<i8")
        doc = gg["doc_id"].combine_chunks()
        first = _adjacent_change(doc, n)
        bounds = np.flatnonzero(first)
        ends = np.r_[bounds[1:], n]
        ids = doc.take(pa.array(bounds))
        if ids.type != id_type:
            ids = ids.cast(id_type)
        return pa.table(
            {
                "doc_id": ids,
                "starts": pa.array(
                    [pos[s:e].tobytes() for s, e in zip(bounds, ends)],
                    pa.binary(),
                ),
            }
        )

    return spans_per_bucket
