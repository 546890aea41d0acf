"""Cross-row duplicated token-window removal as a table maintenance op.

The exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better"), grid-approximated and applied to
the north-star sequences table: fixed ``width``-token windows at
``stride`` offsets; a window whose exact token content occurs in >=
``min_dups`` distinct rows keeps only its corpus-first instance
(ordered by ``(doc_id, position)``); every other instance's span is
cut from its row's ``tokens`` (overlapping spans merged before
cutting) and ``n_tok`` updated. The reference deduplicates by key only
(``drop_duplicates(subset=['text_id'])``, fupi/embedders.py:92) —
content-level window dedup is this engine's LLM-pipeline extension of
the same idea, sharing the exchange skeleton with the documents-table
variant (``pipelines/queries.py q_dedup_substring_rm``).

Scale shape, phase by phase:

1. **Detect** — one streaming pass over ``scan(columns=[doc_id,
   tokens])``: windows come out of each block as a single vectorized
   byte-gather (``textkernels.list_windows``: window rows are the
   little-endian int32 token bytes, so byte equality == token
   equality); instances shuffle ONCE keyed on ``hash(window) % B``
   (never the raw window — one Ray group per distinct window means one
   Python call per window) and each bucket picks survivors with one
   vectorized pandas pass over the full window bytes (a hash collision
   only CO-LOCATES two windows, never merges them). At ``stride =
   width/2`` the exchange carries ~``8 bytes/token`` ≈ 2x the token
   volume — the documented cost of exact-match semantics.
2. **Span assembly** — removals roll up to one ``(doc_id, starts)``
   row per affected row (starts packed as little-endian int64 bytes:
   one flat buffer per block, no list-of-list columns on the wire);
   a second, small exchange keyed on ``hash(doc_id)``.
3. **Rewrite rows** — the spans (small: affected rows only) attach to
   the pinned full-schema scan via the size-guarded ``enrich_join``:
   under the broadcast budget the BIG side streams with zero shuffle
   (sorted-key ``searchsorted`` probe per block); above it, one
   hash exchange. The cut itself is ``merged_cut_segments`` + one
   ``multirange_gather`` over the flat int32 token values per block —
   no per-row Python anywhere.
4. **Commit** — the rewritten rows land via ``merge_into(...,
   when_matched="update")``, inheriting zone-map + bloom fragment
   pruning, bounded copy fan-out, lineage records and resumability;
   ``mode="dv"`` masks instead of rewriting (O(matched) bytes) for
   small cut fractions on huge tables.

A row whose every token is cut keeps its (now empty) row — dropping
rows is a policy decision left to a separate ``delete_where``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fupi_ray.functions import textkernels as tk
from fupi_ray.functions import windowspans as ws
from fupi_ray.functions.hashing import mix64
from fupi_ray.ops.join import enrich_join
from fupi_ray.ops.merge import merge_into
from fupi_ray.schema import _unwrap_tensor
from fupi_ray.table import Table


def _win_bucket(wins: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket id per window-byte row: fold the 8-byte words of each
    row through mix64 (vectorized over rows; width/2 passes total).
    Odd widths pay one zero-pad copy so the uint64 view is legal
    (padding is constant per row — equal windows still collide)."""
    m, wb = wins.shape
    if wb % 8:
        padded = np.zeros((m, wb + (8 - wb % 8)), dtype=np.uint8)
        padded[:, :wb] = wins
        wins = padded
    w64 = np.ascontiguousarray(wins).view(np.uint64)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(w64.shape[1]):
        h = mix64(h ^ w64[:, j])
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _detect_spans(
    src: ray.data.Dataset, width: int, stride: int, min_dups: int, num_buckets: int
) -> ray.data.Dataset:
    """(doc_id, starts) per affected row: starts of every duplicated
    window instance except each window's corpus-first, as LE int64
    bytes sorted ascending within the row."""

    def extract(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "win": pa.array([], pa.large_binary()),
                "doc_id": pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        wins, doc_idx, n_win, ew = tk.list_windows(
            _unwrap_tensor(batch["tokens"].combine_chunks()), width, stride
        )
        m = wins.shape[0]
        if m == 0:
            return empty
        wb = width * ew
        first = np.zeros(len(n_win) + 1, dtype=np.int64)
        np.cumsum(n_win, out=first[1:])
        k = np.arange(m, dtype=np.int64) - np.repeat(first[:-1], n_win)
        offs = np.arange(0, (m + 1) * wb, wb, dtype=np.int64)
        # py_buffer wraps the gather output zero-copy (the fancy-index
        # result is C-contiguous and the buffer keeps it alive) — the
        # window matrix is ~2x the block's token bytes, so an extra
        # .tobytes() pass here would double the hottest path's memcpy
        win_arr = pa.Array.from_buffers(
            pa.large_binary(),
            m,
            [None, pa.py_buffer(offs), pa.py_buffer(wins)],
        )
        ids = batch["doc_id"].combine_chunks().take(pa.array(doc_idx))
        return pa.table(
            {
                "bkt": pa.array(_win_bucket(wins, num_buckets)),
                "win": win_arr,
                "doc_id": ids,
                "pos": pa.array(k * stride),
            }
        )

    inst = src.map_batches(extract, batch_format="pyarrow")
    removals = inst.groupby("bkt").map_groups(
        ws.choose_removals_fn(min_dups, num_buckets, pa.string()),
        batch_format="pandas",
    )
    return removals.groupby("dbkt").map_groups(
        ws.spans_per_bucket_fn(pa.string()), batch_format="pandas"
    )


def _cut_batch(batch: pa.Table, width: int, n_tok_type: pa.DataType) -> pa.Table:
    """Cut each row's merged duplicated spans out of ``tokens`` and
    refresh ``n_tok``; drops the ``starts`` payload, appends
    ``_wd_removed`` / ``_wd_spans`` stat columns."""
    n = batch.num_rows
    ti = batch.column_names.index("tokens")
    ni = batch.column_names.index("n_tok")
    if n == 0:
        out = batch.drop_columns(["starts"])
        return out.append_column(
            "_wd_removed", pa.array([], pa.int64())
        ).append_column("_wd_spans", pa.array([], pa.int64()))
    starts_col = batch["starts"].combine_chunks()
    blob_offs = tk.arrow_offsets(starts_col)
    span_counts = (np.diff(blob_offs) // 8).astype(np.int64)
    vals = np.frombuffer(starts_col.buffers()[2], dtype=np.uint8)
    starts_flat = (
        vals[blob_offs[0] : blob_offs[-1]].copy().view("<i8").astype(np.int64)
    )
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), span_counts)
    toks = _unwrap_tensor(batch["tokens"].combine_chunks())
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    lens = np.diff(offsets)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    base = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=base[1:])
    seg_doc, seg_s, seg_e, removed, n_spans = tk.merged_cut_segments(
        n, doc_rep, starts_flat, width, lens
    )
    seg_len = seg_e - seg_s
    newflat = tk.multirange_gather(flat, base[seg_doc] + seg_s, seg_len)
    newlens = np.bincount(
        seg_doc, weights=seg_len.astype(np.float64), minlength=n
    ).astype(np.int64)
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(newlens, out=new_offs[1:])
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()),
        pa.array(newflat.astype(np.int32, copy=False), pa.int32()),
    )
    out = batch.set_column(ti, "tokens", tokens_arr)
    out = out.set_column(ni, "n_tok", pc.cast(pa.array(newlens), n_tok_type))
    out = out.drop_columns(["starts"])
    return out.append_column("_wd_removed", pa.array(removed)).append_column(
        "_wd_spans", pa.array(n_spans)
    )


def dedup_token_windows(
    table: Table,
    width: int = 50,
    stride: int | None = None,
    min_dups: int = 2,
    num_buckets: int | None = None,
    mode: str = "cow",
    job_id: str | None = None,
) -> dict:
    """Remove duplicated token windows from ``table``; returns metrics
    ``{version, rows_rewritten, tokens_removed, spans_cut}``.

    ``version`` is unchanged (no commit) when nothing is duplicated.
    Detection runs against the version current at entry; the final
    MERGE rebases over commits that land mid-run (``state/commit.py``).
    """
    if width < 1 or (stride is not None and stride < 1):
        raise ValueError("width and stride must be >= 1")
    stride = max(width // 2, 1) if stride is None else stride
    parent = table.latest_version()
    if num_buckets is None:
        # size buckets from the IN-MEMORY exchange volume, not the
        # compressed on-disk bytes (dictionary/RLE-friendly token
        # distributions compress several-fold, which would under-bucket
        # and let one materialized group outgrow a worker heap):
        # windows/row ~ n_tok/stride, 4*width bytes each, plus ~25% for
        # doc_id/pos/bkt — sum_n_tok is exact per fragment meta
        tok = sum(f.sum_n_tok or 0 for f in table.manifest(parent).fragments)
        exch_bytes = int(tok * 4 * max(width / stride, 1.0) * 1.25)
        num_buckets = int(max(64, -(-exch_bytes // (256 * 1024 * 1024))))

    spans = _detect_spans(
        table.scan(parent, columns=["doc_id", "tokens"]),
        width,
        stride,
        min_dups,
        num_buckets,
    ).materialize()
    if spans.count() == 0:
        return {
            "version": parent,
            "rows_rewritten": 0,
            "tokens_removed": 0,
            "spans_cut": 0,
        }

    n_tok_type = table.schema(parent).field("n_tok").type
    rewritten = enrich_join(
        table.scan(parent),
        spans,
        on="doc_id",
        value_cols=["starts"],
        how="inner",
    ).map_batches(
        lambda b: _cut_batch(b, width, n_tok_type), batch_format="pyarrow"
    ).materialize()
    stats = rewritten.sum(["_wd_removed", "_wd_spans"]) or {}
    source = rewritten.drop_columns(["_wd_removed", "_wd_spans"])
    # pin the MERGE to the detection snapshot: a commit landing between
    # our scan and here must fail this op loudly (CommitError — caller
    # re-runs), never upsert stale rows (a concurrently-deleted row
    # would come back as an unmatched "insert")
    version = merge_into(
        table,
        source,
        job_id=job_id or f"windedup-v{parent}",
        mode=mode,
        when_matched="update",
        expected_parent=parent,
    )
    return {
        "version": version,
        "rows_rewritten": rewritten.count(),
        "tokens_removed": int(stats.get("sum(_wd_removed)", 0) or 0),
        "spans_cut": int(stats.get("sum(_wd_spans)", 0) or 0),
    }
