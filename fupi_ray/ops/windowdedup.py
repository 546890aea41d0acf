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

1. **Detect, two exact phases** — phase A streams
   ``scan(columns=[doc_id, tokens])`` once and exchanges only 16 bytes
   per block-distinct 64-bit window hash (``np.unique``-pre-aggregated
   counts → global ``groupby(h).sum``); hashes occurring >=
   ``min_dups`` times broadcast back as one sorted array (``ray.put``
   once, zero-copy ``ray.get`` per block). Phase B re-scans and ships
   the FULL window bytes only for candidate windows — each bucket then
   picks survivors with one vectorized pandas pass over the exact
   bytes and the exact distinct-row count, so phase A being a superset
   (within-row repeats, hash collisions) never changes the result.
   With no duplication (the common production case) phase B never
   runs: the whole detect is one hash exchange at ~``0.3
   bytes/token`` vs the naive ~``8 bytes/token`` (full windows at
   ``stride = width/2``). Past ``_CAND_BROADCAST_MAX`` candidates the
   direct single-pass shape takes over (dense duplication: most
   windows must travel anyway, and it avoids a driver-heap copy).
   Windows come out of each block as a single vectorized byte-gather
   (``textkernels.list_windows``: window rows are the little-endian
   int32 token bytes, so byte equality == token equality); instances
   shuffle keyed on ``hash(window) % B`` — never the raw window (one
   Ray group per distinct window would mean one Python call per
   window).
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
from fupi_ray.ops.join import enrich_join
from fupi_ray.ops.merge import merge_into
from fupi_ray.schema import _unwrap_tensor
from fupi_ray.table import Table


# broadcast ceiling for the phase-A candidate set: 48M uint64 hashes
# ≈ 384 MB in the object store. Past this, duplication is so dense
# that most windows would travel anyway — the direct single-pass path
# is exchange-optimal there and avoids a driver-heap copy.
_CAND_BROADCAST_MAX = 48_000_000

_INST_EMPTY = pa.table(
    {
        "bkt": pa.array([], pa.int64()),
        "win": pa.array([], pa.large_binary()),
        "doc_id": pa.array([], pa.string()),
        "pos": pa.array([], pa.int64()),
    }
)


def _block_windows(batch: pa.Table, width: int, stride: int):
    """Per-block window extraction shared by both phases: returns
    ``(wins, h64, doc_idx, pos)`` or None when the block has none."""
    if batch.num_rows == 0:
        return None
    wins, doc_idx, n_win, _ew = tk.list_windows(
        _unwrap_tensor(batch["tokens"].combine_chunks()), width, stride
    )
    m = wins.shape[0]
    if m == 0:
        return None
    first = np.zeros(len(n_win) + 1, dtype=np.int64)
    np.cumsum(n_win, out=first[1:])
    k = np.arange(m, dtype=np.int64) - np.repeat(first[:-1], n_win)
    return wins, ws.row_hash64(wins), doc_idx, k * stride


def _instances_table(
    wins: np.ndarray, h: np.ndarray, ids: pa.Array, pos: np.ndarray, num_buckets: int
) -> pa.Table:
    """(bkt, win, doc_id, pos) instance rows for the survivor exchange.
    py_buffer wraps the gather output zero-copy (the fancy-index result
    is C-contiguous and the buffer keeps it alive) — the window matrix
    is ~2x the covered token bytes, so an extra ``.tobytes()`` pass
    here would double this path's memcpy."""
    m, wb = wins.shape
    offs = np.arange(0, (m + 1) * wb, wb, dtype=np.int64)
    win_arr = pa.Array.from_buffers(
        pa.large_binary(), m, [None, pa.py_buffer(offs), pa.py_buffer(wins)]
    )
    return pa.table(
        {
            "bkt": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "win": win_arr,
            "doc_id": ids,
            "pos": pa.array(pos),
        }
    )


def _candidate_hashes(
    scan, width: int, stride: int, min_dups: int, n_cbkt: int = 64
) -> np.ndarray:
    """Phase A: global occurrence count per 64-bit window hash; returns
    the SORTED uint64 hashes whose count >= ``min_dups``.

    This is a superset of the truly-duplicated windows (a hash counts
    repeats WITHIN a row, and distinct windows can collide) — phase B
    re-checks exact bytes and distinct-row count, so exactness is
    untouched. The exchange carries 16 bytes per block-distinct hash
    (``np.unique`` pre-aggregates inside each block) instead of the
    full window bytes — ~13x less than the direct path at width=50.
    ``n_cbkt`` bounds one materialized count bucket (the caller sizes
    it so a bucket stays ~256 MB at its window count)."""

    def hash_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "hbkt": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        got = _block_windows(batch, width, stride)
        if got is None:
            return empty
        _wins, h, _doc_idx, _pos = got
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "hbkt": pa.array((u % np.uint64(n_cbkt)).astype(np.int64)),
                "h": pa.array(u.view(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    def sum_bucket(g: pa.Table) -> pa.Table:
        # one hash bucket per group: np.unique-keyed reduceat sums —
        # Ray's per-key Aggregate on millions of distinct keys is the
        # measured pathology this bucketing exists to avoid (see
        # queries.py q_dedup_substring). Arrow-typed empty output.
        h = g["h"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, first = np.unique(h[order], return_index=True)
        sums = np.add.reduceat(cnt[order], first) if len(hs) else np.empty(0, np.int64)
        keep = sums >= min_dups
        return pa.table({"h": pa.array(hs[keep], pa.int64())})

    cand = (
        scan()
        .map_batches(hash_counts, batch_format="pyarrow")
        .groupby("hbkt")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )
    blocks = [b for b in ray.get(cand.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return np.empty(0, np.uint64)
    hs = np.concatenate(
        [b["h"].to_numpy(zero_copy_only=False) for b in blocks]
    ).view(np.uint64)
    hs.sort()
    return hs


def _detect_spans(
    scan,
    width: int,
    stride: int,
    min_dups: int,
    num_buckets: int,
    max_broadcast: int = _CAND_BROADCAST_MAX,
) -> ray.data.Dataset | None:
    """(doc_id, starts) per affected row: starts of every duplicated
    window instance except each window's corpus-first, as LE int64
    bytes sorted ascending within the row. ``scan`` is a zero-arg
    factory for a fresh ``(doc_id, tokens)`` dataset — the sparse path
    reads it twice. Returns None when phase A proves nothing repeats
    (the common production case: one cheap hash exchange, no window
    bytes ever leave their block, no second scan). ``num_buckets`` was
    sized by the caller for the ~``5*width``-bytes/window instance
    exchange; the phase-A count exchange carries 24 bytes/window, so
    its bucket count scales down by that ratio (floor 64)."""
    n_cbkt = max(64, -(-num_buckets * 24 // (5 * width)))
    cands = _candidate_hashes(scan, width, stride, min_dups, n_cbkt=n_cbkt)
    if len(cands) == 0:
        return None

    if len(cands) <= max_broadcast:
        cand_ref = ray.put(cands)

        def extract(batch: pa.Table) -> pa.Table:
            got = _block_windows(batch, width, stride)
            if got is None:
                return _INST_EMPTY
            wins, h, doc_idx, pos = got
            cs = ray.get(cand_ref)  # zero-copy view of the plasma copy
            idx = np.minimum(np.searchsorted(cs, h), len(cs) - 1)
            sel = np.flatnonzero(cs[idx] == h)
            if len(sel) == 0:
                return _INST_EMPTY
            ids = batch["doc_id"].combine_chunks().take(pa.array(doc_idx[sel]))
            return _instances_table(wins[sel], h[sel], ids, pos[sel], num_buckets)

    else:
        # dense-duplication fallback: ship every instance (the original
        # single-pass shape — most windows travel either way here)
        def extract(batch: pa.Table) -> pa.Table:
            got = _block_windows(batch, width, stride)
            if got is None:
                return _INST_EMPTY
            wins, h, doc_idx, pos = got
            ids = batch["doc_id"].combine_chunks().take(pa.array(doc_idx))
            return _instances_table(
                np.ascontiguousarray(wins), h, ids, pos, num_buckets
            )

    inst = scan().map_batches(extract, batch_format="pyarrow")
    removals = inst.groupby("bkt").map_groups(
        ws.choose_removals_fn(min_dups, num_buckets, pa.string()),
        batch_format="pyarrow",
    )
    return removals.groupby("dbkt").map_groups(
        ws.spans_per_bucket_fn(pa.string()), batch_format="pyarrow"
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
        lambda: table.scan(parent, columns=["doc_id", "tokens"]),
        width,
        stride,
        min_dups,
        num_buckets,
    )
    spans = spans.materialize() if spans is not None else None
    if spans is None or spans.count() == 0:
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
