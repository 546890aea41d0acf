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

Outputs are TYPED Arrow tables: a 0-row object-dtype pandas frame
(most buckets, when duplication is sparse) trips Ray's block-size
estimator into per-block error logs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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


def choose_removals_fn(min_dups: int, num_buckets: int, id_type: pa.DataType):
    """Per window-hash bucket: sub-group on the exact window bytes
    (a hash collision only CO-LOCATES two windows, never merges them);
    a window spanning >= ``min_dups`` distinct docs loses every
    instance but the ``(doc_id, pos)`` minimum. Emits the removals
    re-keyed by ``stable_hash(doc_id) % num_buckets``."""

    def choose_removals(g: pd.DataFrame) -> pa.Table:
        gg = g.sort_values(["win", "doc_id", "pos"], kind="stable")
        ndocs = gg.groupby("win", sort=False)["doc_id"].transform("nunique")
        first = ~gg.duplicated("win")
        rm = gg[(ndocs >= min_dups).to_numpy() & ~first.to_numpy()]
        ids = rm["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, id_type),
                "pos": pa.array(rm["pos"].to_numpy(), pa.int64()),
                "dbkt": pa.array(
                    (stable_hash(ids) % np.uint64(num_buckets)).astype(np.int64)
                    if len(ids)
                    else np.empty(0, np.int64)
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

    def spans_per_bucket(g: pd.DataFrame) -> pa.Table:
        gg = g.sort_values(["doc_id", "pos"], kind="stable")
        pos = gg["pos"].to_numpy().astype("<i8")
        ids = gg["doc_id"].to_numpy()
        first = np.ones(len(ids), dtype=bool)
        if len(ids) > 1:
            first[1:] = ids[1:] != ids[:-1]
        bounds = np.flatnonzero(first)
        ends = np.r_[bounds[1:], len(ids)]
        return pa.table(
            {
                "doc_id": pa.array(ids[bounds], id_type),
                "starts": pa.array(
                    [pos[s:e].tobytes() for s, e in zip(bounds, ends)],
                    pa.binary(),
                ),
            }
        )

    return spans_per_bucket
