"""MERGE INTO: hash-aware upsert with copy-on-write fragment rewrite.

The reference upserts only by full rebuild — ``create_table(mode=
'overwrite')`` then ``add`` (fupi/utils.py:39-49, fupi/embedders.py:
124-125). Per the north rule our engine does real MERGE (SURVEY.md
§2.4 J3):

1. **Source dedup** — duplicate ``doc_id`` in the source keeps the
   first occurrence by ``_src_order`` (the distributed analogue of the
   reference's ``drop_duplicates(subset=['text_id'])`` keep='first',
   fupi/embedders.py:92, whose "first" is driver row order; an
   explicit order column makes that well-defined under parallelism).
2. **Zone-map prune** — only target fragments whose [min,max] doc_id
   range contains at least one source key are rewritten; every other
   fragment is carried into the new manifest untouched (copy-on-write).
3. **Anti-join** — matched target rows are dropped; two strategies:
   * broadcast (default): the deduped key set is ``ray.put`` once and
     each fragment-rewrite task drops matches via sorted-array
     ``searchsorted`` — no shuffle of the (huge) target side at all;
   * hash-shuffle: when the source exceeds
     ``config.merge_broadcast_max_keys``, target-hit rows and source
     rows are tagged, bucketed by ``stable_hash(doc_id) % B`` and
     resolved per bucket (one exchange, vectorized pandas per bucket).
4. **Commit** — new fragments (rewritten survivors + all source rows)
   swap in atomically via the manifest commit actor.

Last-write-wins: a source row always replaces the target row with the
same key. Per-fragment rewrites are independent partitions with
lineage records → resumable.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from fupi_ray.functions import bloom
from fupi_ray.ops import _fanout
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.manifest import (
    FragmentMeta,
    apply_rename,
    frag_recon as mf_recon,
    fragment_meta_from_table,
)
from fupi_ray.schema import SEQUENCE_COLUMNS, normalize_batch
from fupi_ray.state import fs as _fs
from fupi_ray.state import lineage
from fupi_ray.table import Table, write_dataset_fragments


def _list_content_hash(col) -> np.ndarray:
    """Per-row order-sensitive hash of a list column, vectorized:
    mix the flat values once, then fold each row's segment (position ^
    value mixes) with a reduceat XOR. Empty rows hash to 0."""
    from fupi_ray.functions.hashing import mix64
    from fupi_ray.schema import _unwrap_tensor

    lst = _unwrap_tensor(col)
    n = len(lst)
    offsets = np.asarray(lst.offsets, dtype=np.int64)
    values = lst.values.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    if len(values) == 0:
        return out
    # fold element position so permutations hash differently
    pos = np.arange(len(values), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    vh = mix64(values.astype(np.uint64, copy=False) ^ pos.astype(np.uint64))
    nz = np.nonzero(lengths > 0)[0]
    starts = offsets[:-1]
    out[nz] = np.bitwise_xor.reduceat(vh, starts[nz])
    # reduceat folds to the NEXT nonzero start; restrict each row to
    # its own segment by construction: consecutive nonzero rows'
    # segments are adjacent in `vh` (zero-length rows contribute no
    # elements), so the fold is exact.
    out[nz] = mix64(out[nz] ^ lengths[nz].astype(np.uint64))
    return out


def _content_order(batch: pa.Table) -> np.ndarray:
    """Deterministic fallback source order when ``_src_order`` is
    absent: a FULL content hash over every column (so duplicate
    resolution never depends on nondeterministic block arrival order,
    even for rows equal on (doc_id, n_tok) but different in payload)."""
    h = stable_hash(batch["doc_id"])
    for name in batch.column_names:
        if name == "doc_id" or name.startswith("_"):
            continue
        col = batch[name]
        typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            h ^= _list_content_hash(col)
        else:
            h ^= stable_hash(col)
    return h.astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def _ensure_src_order(batch: pa.Table) -> pa.Table:
    if "_src_order" in batch.column_names:
        return batch
    return batch.append_column("_src_order", pa.array(_content_order(batch)))


# hashes-only duplicate pre-count budget: 32M rows = 256 MiB of uint64
# on the driver. Above it the payload exchange runs unconditionally
# (the shuffle-strategy regime, where it is needed anyway).
_DUP_COUNT_ROWS_CAP = 32_000_000


def _dedup_source(source: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    """Keep-first dedup of the source by doc_id (min ``_src_order``).

    Two-phase: a hashes-only pre-count (8B/row to the driver, capped at
    ``_DUP_COUNT_ROWS_CAP`` rows) finds doc_id hashes occurring on >= 2
    rows. A well-formed feed has none and skips the payload exchange
    entirely; otherwise only hash-repeating rows (a superset of the
    duplicates — hash collisions are conservative) enter the bucket
    shuffle, and unique rows pass through untouched. The exchange
    itself is one hash-shuffle bucketed by ``stable_hash(doc_id) % B``
    with vectorized per-bucket drop_duplicates; result SET is identical
    to dedup-everything (duplicate groups always land hot).

    ``source`` must be materialized (both callers hold it in the
    object store already): the pre-count is a second pass over it.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _ensure_src_order(batch)
        b = (stable_hash(batch["doc_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    def dedup_bucket(g: pa.Table) -> pa.Table:
        # pure-Arrow keep-first (a pandas group fn would convert the
        # token-list payload object-by-object both ways)
        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("_src_order", "ascending")]
        )
        g = g.take(order)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        if len(ids) > 1:
            keep[1:] = ids[1:] != ids[:-1]
        return g.filter(pa.array(keep))

    def full_exchange(ds: ray.data.Dataset) -> ray.data.Dataset:
        return (
            ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_bucket")
            .map_groups(dedup_bucket, batch_format="pyarrow")
            .drop_columns(["_bucket", "_src_order"])
        )

    def drop_order(batch: pa.Table) -> pa.Table:
        if "_src_order" in batch.column_names:
            return batch.drop_columns(["_src_order"])
        return batch

    try:
        n_rows = source.count()
    except Exception:
        n_rows = None
    if n_rows is None or n_rows > _DUP_COUNT_ROWS_CAP or n_rows == 0:
        return full_exchange(source)

    def id_hashes(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        return pa.table({"h": pa.array(stable_hash(batch["doc_id"]))})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in source.map_batches(
            id_hashes, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    hs = np.sort(np.concatenate(parts)) if parts else np.array([], np.uint64)
    dup = np.unique(hs[:-1][hs[1:] == hs[:-1]]) if len(hs) > 1 else hs[:0]
    if len(dup) == 0:
        try:
            has_order = "_src_order" in (source.schema().names or [])
        except Exception:
            has_order = True
        if not has_order:
            return source  # already key-unique: reuse the materialized blocks
        return source.map_batches(
            drop_order, batch_format="pyarrow", zero_copy_batch=True
        )
    dup_ref = ray.put(dup)

    def split(batch: pa.Table, want_hot: bool) -> pa.Table:
        if batch.num_rows == 0:
            return drop_order(batch) if not want_hot else batch
        d = ray.get(dup_ref)
        hb = stable_hash(batch["doc_id"])
        pos = np.searchsorted(d, hb)
        pos[pos == len(d)] = 0
        hot = d[pos] == hb
        if want_hot:
            return batch.filter(pa.array(hot))
        return drop_order(batch.filter(pa.array(~hot)))

    hot_ds = source.map_batches(
        lambda b: split(b, True), batch_format="pyarrow", zero_copy_batch=True
    )
    cold_ds = source.map_batches(
        lambda b: split(b, False), batch_format="pyarrow", zero_copy_batch=True
    )
    return full_exchange(hot_ds).union(cold_ds)


def _collect_broadcast_keys(
    deduped: ray.data.Dataset,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side collect of the deduped source's ``doc_id`` column →
    ``(kb_lex, key_hashes_sorted, key_bytes_hash_order)``.

    Arrow-native fast path: the variable-length string column becomes
    ONE fixed-width uint8 matrix via an offsets scatter, viewed as a
    numpy ``S``-dtype array — no object-dtype lexicographic sort and no
    per-element ``np.char.encode`` (both driver-bound: the old path
    cost a flat ~3.5 s for ~1M keys at EVERY cpu count). numpy ``S``
    comparisons treat trailing NULs as padding, which matches
    variable-length UTF-8 byte order (== code-point order) for
    NUL-free strings; embedded NULs, nulls, and non-string key types
    fall back to the object path. ``kb_lex`` is memcmp-sorted for
    zone-map pruning (see ``_zone_overlaps_keys``); the other two are
    the broadcast probe arrays in hash order, bit-identical to the old
    path's (hash ties carry equal hash values, so the probe's
    full-run byte confirmation is order-insensitive)."""
    bt = list(
        deduped.select_columns(["doc_id"]).iter_batches(batch_format="pyarrow")
    )
    arr = (
        pa.concat_tables(bt).column("doc_id").combine_chunks()
        if bt
        else pa.array([], pa.string())
    )
    n = len(arr)
    if n == 0:
        e = np.array([], dtype="S1")
        return e, np.array([], dtype=np.uint64), e
    if pa.types.is_large_string(arr.type):
        # int32 offsets suffice: the broadcast key budget is far below
        # 2 GiB of id bytes
        arr = arr.cast(pa.string())
    if pa.types.is_string(arr.type) and arr.null_count == 0:
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        if not (data == 0).any():
            lens = np.diff(off)
            w = max(int(lens.max()) if n else 1, 1)
            mat = np.zeros((n, w), dtype=np.uint8)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            col = np.arange(len(data), dtype=np.int64) - np.repeat(off[:-1], lens)
            mat[row, col] = data
            kb = mat.view(f"S{w}").ravel()
            h = stable_hash(arr)
            order = np.argsort(h, kind="stable")
            return np.sort(kb), h[order], kb[order]
    keys = np.sort(arr.to_numpy(zero_copy_only=False).astype(object))
    h = stable_hash(keys)
    order = np.argsort(h, kind="stable")
    return keys, h[order], np.char.encode(keys[order].astype(str), "utf-8")


def _zone_overlaps_keys(kb_lex: np.ndarray, zmin, zmax) -> bool:
    """Does any broadcast key fall inside the fragment zone-map range
    ``[zmin, zmax]``? ``kb_lex`` is the lex-sorted output of
    ``_collect_broadcast_keys`` — fixed-width bytes on the fast path
    (bounds longer than the width compare by prefix: a key equal to
    the truncated prefix is strictly below the longer bound, so both
    bound probes use the ``right`` side of the prefix), objects on the
    fallback."""
    if len(kb_lex) == 0:
        return False
    if kb_lex.dtype.kind == "S":
        w = kb_lex.dtype.itemsize
        bmin = str(zmin).encode("utf-8")
        bmax = str(zmax).encode("utf-8")
        if len(bmin) <= w:
            lo = np.searchsorted(kb_lex, np.array(bmin, dtype=f"S{w}"), side="left")
        else:
            lo = np.searchsorted(
                kb_lex, np.array(bmin[:w], dtype=f"S{w}"), side="right"
            )
        if len(bmax) <= w:
            hi = np.searchsorted(kb_lex, np.array(bmax, dtype=f"S{w}"), side="right")
        else:
            hi = np.searchsorted(
                kb_lex, np.array(bmax[:w], dtype=f"S{w}"), side="right"
            )
        return bool(lo < hi)
    lo_i = int(np.searchsorted(kb_lex, zmin, side="left"))
    return lo_i < len(kb_lex) and kb_lex[lo_i] <= zmax


def _probe_key_run_positions(
    ids: np.ndarray, key_hashes: np.ndarray, key_bytes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-id POSITION into the sorted broadcast key arrays (-1 when
    the id is not a key): sorted-hash ``searchsorted`` probe, then
    exact utf-8 byte confirmation over the FULL run of equal hashes
    (collisions between distinct doc_ids would otherwise hide the
    second key; runs are length 1 almost always, so the loop is over
    the max run width, vectorized across rows at each width). Returns
    ``(positions int64, id hashes)`` — the hashes are reused by
    callers (bloom sidecar rebuild). This is the single home of the
    collision-run logic; every broadcast-side probe derives from it."""
    id_hashes = stable_hash(ids)
    pos = np.full(len(ids), -1, np.int64)
    lo = np.searchsorted(key_hashes, id_hashes, side="left")
    hi = np.searchsorted(key_hashes, id_hashes, side="right")
    ci = np.nonzero(hi > lo)[0]
    if len(ci):
        ids_b = np.char.encode(ids[ci].astype(str), "utf-8")
        run_lo, run_hi = lo[ci], hi[ci]
        sub = np.full(len(ci), -1, np.int64)
        for w in range(int((run_hi - run_lo).max())):
            sel = (run_lo + w < run_hi) & (sub < 0)
            if not sel.any():
                break
            idx = np.minimum(run_lo + w, len(key_bytes) - 1)
            eq = sel & (key_bytes[idx] == ids_b)
            sub[eq] = idx[eq]
        pos[ci] = sub
    return pos, id_hashes


def _probe_keys(
    ids: np.ndarray, key_hashes: np.ndarray, key_bytes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Membership of each ``doc_id`` in the broadcast key set; returns
    ``(matched bool mask, id hashes)``."""
    pos, id_hashes = _probe_key_run_positions(ids, key_hashes, key_bytes)
    return pos >= 0, id_hashes


def _source_range_hit_fragments(
    deduped: ray.data.Dataset, m
) -> list[FragmentMeta] | None:
    """Shuffle-path coarse prune shared by MERGE and insert_missing:
    fragments whose doc_id zone range overlaps the source's [min,max]
    key range (per-batch partial min/max — no full-column aggregate
    kernel, nothing but two strings per batch on the driver). Returns
    None when the source has no rows."""
    mm = deduped.map_batches(
        lambda t: pa.table(
            {"lo": [pc.min(t["doc_id"]).as_py()], "hi": [pc.max(t["doc_id"]).as_py()]}
        )
        if t.num_rows
        else pa.table({"lo": pa.array([], pa.string()), "hi": pa.array([], pa.string())}),
        batch_format="pyarrow",
    ).take_all()
    if not mm:
        return None
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    return [
        f
        for f in m.fragments
        if f.zone_map.get("doc_id") is None
        or not (f.zone_map["doc_id"]["max"] < lo or f.zone_map["doc_id"]["min"] > hi)
    ]


@ray.remote(num_cpus=1)
def _dv_merge_task(
    table_dir: str,
    job_id: str,
    frag_idx: int,
    rel_path: str,
    dv_rel: str | None,
    read_cols: list[str] | None,
    keys_ref,
    keys_digest: str | None,
) -> dict:
    """Merge-on-read half of MERGE INTO, one hit fragment: probe ONLY
    the key column (+ n_tok for exact token accounting) against the
    broadcast source keys and record matched row POSITIONS in a new
    deletion-vector sidecar. The Parquet payload is never read or
    rewritten — a merge whose source touches k rows in this fragment
    costs O(key-column bytes) read + O(k) written, vs the COW task's
    O(fragment bytes) both ways. Idempotent via lineage, keyed on the
    key-set digest AND the input DV."""
    from fupi_ray.ops import dv as _dvmod

    partition = f"frag-{frag_idx:05d}"
    existing = lineage.read_record(table_dir, job_id, partition)
    if (
        existing is not None
        and existing.get("input_fragments") == [rel_path]
        and existing.get("metrics", {}).get("keys_digest") == keys_digest
        and existing.get("metrics", {}).get("input_dv", "") == (dv_rel or "")
    ):
        return existing

    t0 = time.perf_counter()
    abs_path = _fs.join(table_dir, rel_path)

    def record(metrics: dict) -> dict:
        metrics.update(
            {
                "seconds": round(time.perf_counter() - t0, 4),
                "keys_digest": keys_digest,
                "input_dv": dv_rel or "",
            }
        )
        lineage.write_record(
            table_dir,
            job_id,
            partition,
            input_fragments=[rel_path],
            output_fragments=[],
            metrics=metrics,
        )
        return lineage.read_record(table_dir, job_id, partition)

    key_hashes, key_bytes = keys_ref
    blob = bloom.read_sidecar(abs_path)
    if blob is not None and not bloom.may_contain_any(blob, key_hashes):
        return record({"rows_matched": 0, "unchanged": True, "bloom_skip": True})

    tbl = _fs.read_parquet_table(abs_path, columns=read_cols)
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    matched, _ = _probe_keys(ids, key_hashes, key_bytes)
    matched_pos = np.flatnonzero(matched).astype(np.uint64)
    old_pos = (
        _dvmod.read_dv(table_dir, dv_rel) if dv_rel else np.empty(0, np.uint64)
    )
    new_pos = np.setdiff1d(matched_pos, old_pos, assume_unique=True)
    if len(new_pos) == 0:
        return record({"rows_matched": 0, "unchanged": True})

    merged = np.union1d(old_pos, new_pos)
    full_delete = len(merged) == tbl.num_rows
    n_tok_delta = 0
    if "n_tok" in tbl.column_names:
        taken = tbl.column("n_tok").take(pa.array(new_pos.astype(np.int64)))
        n_tok_delta = int(pc.sum(taken).as_py() or 0)
    dv_out = None if full_delete else _dvmod.write_dv(table_dir, rel_path, merged)
    return record(
        {
            "rows_matched": int(len(new_pos)),
            "unchanged": False,
            "dv_path": dv_out,
            "dv_rows_total": int(len(merged)),
            "dv_n_tok_delta": n_tok_delta,
            "full_delete": bool(full_delete),
        }
    )


@ray.remote(num_cpus=1)
def _rewrite_fragment_task(
    table_dir: str,
    job_id: str,
    frag_idx: int,
    rel_path: str,
    keys_ref,
    bloom_bits: int | None = None,
    keys_digest: str | None = None,
    dv_rel: str | None = None,
    recon: dict | None = None,
) -> dict:
    """Copy-on-write rewrite of one hit fragment: drop rows whose
    doc_id is in the (broadcast, sorted) source key array; an existing
    deletion vector is applied first (and materialized away — the
    output fragment carries no DV). Idempotent + lineage-recorded → a
    resumed job skips it."""
    partition = f"frag-{frag_idx:05d}"
    existing = lineage.read_record(table_dir, job_id, partition)
    if existing is not None:
        # reuse only if the record covers the SAME input fragment (an
        # intervening commit can remap index i to a different file) AND
        # the SAME key set — a retried merge with a different source at
        # the same parent must not inherit the old run's rewrites
        if (
            existing.get("input_fragments") == [rel_path]
            and existing.get("metrics", {}).get("keys_digest") == keys_digest
            and existing.get("metrics", {}).get("input_dv", "") == (dv_rel or "")
        ):
            return existing

    # keys arrive as (sorted uint64 hashes, fixed-width utf-8 bytes in
    # the same order): both arrays are single-buffer numpy — the
    # broadcast deserializes per task with ZERO per-element python
    # objects (an object-dtype string array costs ~1M string allocs
    # per task, which collapses under 32-way concurrency) and probes
    # stay vectorized. Exact doc_id confirmation runs only on hash
    # hits, so hash collisions cannot drop a wrong row.
    key_hashes, key_bytes = keys_ref  # ObjectRef args resolve before entry
    t0 = time.perf_counter()
    abs_path = _fs.join(table_dir, rel_path)

    # bloom early-exit: on an unclustered table every fragment's doc_id
    # RANGE overlaps the key set, but the sidecar answers membership —
    # a provably-unmatched fragment is kept as-is with no Parquet read
    # or rewrite (the task touched ~bits/8 bytes per row instead of the
    # full payload). No false negatives: a real match never skips.
    blob = bloom.read_sidecar(abs_path)
    if blob is not None and not bloom.may_contain_any(blob, key_hashes):
        lineage.write_record(
            table_dir,
            job_id,
            partition,
            input_fragments=[rel_path],
            output_fragments=[],
            metrics={
                "seconds": time.perf_counter() - t0,
                "bloom_skip": True,
                "rows_dropped": 0,
                "keys_digest": keys_digest,
                "input_dv": dv_rel or "",
            },
        )
        return lineage.read_record(table_dir, job_id, partition)
    tbl = _fs.read_parquet_table(abs_path)
    if dv_rel:
        from fupi_ray.ops import dv as _dv

        tbl = _dv.apply_dv(tbl, _dv.read_dv(table_dir, dv_rel))
    recon = recon or {}
    rmap = recon.get("rmap") or {}
    if rmap:
        # renamed columns: restore declared names so the rewrite
        # materializes the current schema (and its col_ids stamp maps)
        tbl = apply_rename(tbl, rmap)
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    matched, id_hashes = _probe_keys(ids, key_hashes, key_bytes)
    out = tbl.filter(pa.array(~matched))

    outputs: list[FragmentMeta] = []
    if out.num_rows:
        rel_out = f"data/mg-{job_id}-{frag_idx:05d}.parquet"
        abs_out = _fs.join(table_dir, rel_out)
        _fs.write_parquet(out, abs_out, row_group_size=32 * 1024)
        if bloom_bits:
            # survivor hashes were already computed for the probe
            bloom.write_sidecar(abs_out, id_hashes[~matched], bloom_bits)
        # a verbatim copy keeps the input's narrow physical types:
        # carry the widen stamp forward (keys renamed to declared)
        in_types = {
            rmap.get(k, k): v for k, v in (recon.get("col_types") or {}).items()
        }
        outputs.append(
            fragment_meta_from_table(out, abs_out, rel_out, col_types=in_types)
        )
    lineage.write_record(
        table_dir,
        job_id,
        partition,
        input_fragments=[rel_path],
        output_fragments=outputs,
        metrics={
            "seconds": time.perf_counter() - t0,
            "rows_in": tbl.num_rows,
            "rows_dropped": int(matched.sum()),
            "keys_digest": keys_digest,
            "input_dv": dv_rel or "",
        },
    )
    return lineage.read_record(table_dir, job_id, partition)


def _merge_shuffle(
    table: Table,
    hit_frags: list[FragmentMeta],
    deduped: ray.data.Dataset,
    parent: int,
    job_id: str,
    num_buckets: int,
    rows_per_frag: int | None = None,
    tbl_schema: pa.Schema | None = None,
    fill_missing: dict | None = None,
    when_matched: str = "update",
) -> list[FragmentMeta]:
    """Scale path: both sides tagged + bucketed by hash(doc_id); a
    source row wins over the target row of the same key inside each
    bucket. One all-to-all exchange, vectorized resolution per bucket.
    DV'd target fragments read through the masked per-fragment path
    (ops/dv.py) so already-deleted rows never re-enter the resolve.
    ``when_matched="delete"``: a key present on the source side drops
    the WHOLE key group (no source row is ever emitted), so the source
    may be key-only — it is projected to ``doc_id`` before the tag."""
    from fupi_ray.ops import dv as _dvmod

    target = _dvmod.fragments_dataset(
        table.table_dir, hit_frags,
        manifest_ids=table.manifest(parent).column_ids,
    )
    # project to the TABLE's schema (not the hardcoded canonical one):
    # a user table with extra columns round-trips them through MERGE;
    # fragments/sources predating an add-column are padded
    proj_cols = list(tbl_schema.names) if tbl_schema is not None else list(SEQUENCE_COLUMNS)
    fm = fill_missing or {}

    def tag(is_src: int):
        def fn(batch: pa.Table) -> pa.Table:
            if tbl_schema is not None:
                for c in proj_cols:
                    if c in batch.column_names:
                        # pre-widen fragments: cast the narrow physical
                        # type so both union sides share one schema
                        typ = tbl_schema.field(c).type
                        if batch.schema.field(c).type != typ:
                            batch = batch.set_column(
                                batch.column_names.index(c),
                                c,
                                batch[c].cast(typ),
                            )
                        continue
                    typ = tbl_schema.field(c).type
                    dflt = fm.get(c)
                    batch = batch.append_column(
                        c,
                        pa.nulls(batch.num_rows, typ)
                        if dflt is None
                        else pa.array([dflt] * batch.num_rows, type=typ),
                    )
            batch = batch.select(proj_cols)
            b = (stable_hash(batch["doc_id"]) % np.uint64(num_buckets)).astype(np.int32)
            batch = batch.append_column("_bucket", pa.array(b))
            return batch.append_column(
                "_prio", pa.array(np.full(batch.num_rows, is_src, dtype=np.int8))
            )

        return fn

    def resolve(g: pa.Table) -> pa.Table:
        # source rows (_prio=0) sort before target rows (_prio=1) →
        # keep first; pure Arrow, same rationale as dedup_bucket
        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("_prio", "ascending")]
        )
        g = g.take(order)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        if len(ids) > 1:
            keep[1:] = ids[1:] != ids[:-1]
        if when_matched == "delete":
            # the first row of a matched key is the source tombstone:
            # keeping only first-of-key TARGET rows deletes the key
            keep &= g["_prio"].to_numpy(zero_copy_only=False) == 1
        return g.filter(pa.array(keep)).drop_columns(["_bucket", "_prio"])

    # the dedup shuffle returns list columns as Ray tensor-extension
    # arrays; normalize so union blocks share one schema
    norm = lambda b: normalize_batch(b, tbl_schema, fill_missing)  # noqa: E731
    if when_matched == "delete":
        # tombstones carry only the key; tag() null-pads the rest of
        # the schema (those rows are never emitted by resolve)
        src_side = deduped.select_columns(["doc_id"]).map_batches(
            tag(0), batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        src_side = deduped.map_batches(norm, batch_format="pyarrow").map_batches(
            tag(0), batch_format="pyarrow", zero_copy_batch=True
        )
    merged = (
        src_side
        .union(target.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
        .groupby("_bucket")
        .map_groups(resolve, batch_format="pyarrow")
        .map_batches(norm, batch_format="pyarrow")
    )
    from fupi_ray.ops import bucket as _bk

    lay = _bk.preserving_layout(table, "doc_id")
    if lay:
        # bucketed target: the resolved output (rewritten hit rows +
        # inserts) re-lands bucket-pure so the layout contract
        # survives the shuffle merge too
        return _bk.write_bucketized_fragments(
            table, merged, "doc_id", lay["num_buckets"], f"mg-{job_id}"
        )
    return write_dataset_fragments(
        merged,
        table.table_dir,
        f"mg-{job_id}",
        target_fragment_rows=rows_per_frag,
        bloom_bits=table.config.bloom_bits_per_key,
        row_group_rows=table.config.row_group_rows,
    )


def _merge_dv_shuffle_positions(
    table: Table,
    hit_frags: list[FragmentMeta],
    deduped: ray.data.Dataset,
    num_buckets: int,
    job_id: str,
) -> dict[str, dict]:
    """Scale path of the merge-on-read MERGE: discover matched target
    row positions WITHOUT broadcasting the key set. Per hit fragment,
    read only the key column (+ n_tok) with physical positions
    attached; bucket both sides by ``hash(doc_id)``; one exchange of
    key-sized rows resolves membership; a second tiny groupby on
    fragment path writes one deletion-vector sidecar per matched
    fragment. Total I/O is O(key-column bytes + matched rows) — the
    Parquet payloads never move."""
    from fupi_ray.ops import dv as _dvmod

    table_dir = table.table_dir
    items = [
        {
            "path": f.path,
            "dv": f.dv_path or "",
            "cols": ",".join(
                ("doc_id", "n_tok")
                if f.cols is None
                else [c for c in f.cols if c in ("doc_id", "n_tok")]
            ),
        }
        for f in hit_frags
    ]
    key_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("_path", pa.string()),
            ("_pos", pa.int64()),
            ("_ntok", pa.int64()),
            ("_src", pa.int8()),
        ]
    )

    def read_keys(batch: pa.Table) -> pa.Table:
        outs = []
        for p, d, cols in zip(
            batch["path"].to_pylist(),
            batch["dv"].to_pylist(),
            batch["cols"].to_pylist(),
        ):
            tbl = _fs.read_parquet_table(
                _fs.join(table_dir, p), columns=cols.split(",")
            )
            pos = np.arange(tbl.num_rows, dtype=np.int64)
            if d:
                # rows already deleted by the existing DV can't re-match
                mask = _dvmod.live_mask(tbl.num_rows, _dvmod.read_dv(table_dir, d))
                tbl = tbl.filter(pa.array(mask))
                pos = pos[mask]
            ntok = (
                tbl["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
                if "n_tok" in tbl.column_names
                else np.zeros(len(pos), np.int64)
            )
            outs.append(
                pa.table(
                    {
                        "doc_id": tbl["doc_id"].cast(pa.string()),
                        "_path": pa.array([p] * len(pos), pa.string()),
                        "_pos": pa.array(pos),
                        "_ntok": pa.array(ntok),
                        "_src": pa.array(np.zeros(len(pos), np.int8)),
                    }
                )
            )
        if not outs:
            return key_schema.empty_table()
        return pa.concat_tables(outs, promote_options="default")

    tgt = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        read_keys, batch_format="pyarrow"
    )

    def tag_src(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.string()),
                "_path": pa.array([""] * n, pa.string()),
                "_pos": pa.array(np.zeros(n, np.int64)),
                "_ntok": pa.array(np.zeros(n, np.int64)),
                "_src": pa.array(np.ones(n, np.int8)),
            }
        )

    src = deduped.select_columns(["doc_id"]).map_batches(
        tag_src, batch_format="pyarrow"
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        b = (stable_hash(batch["doc_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    both = tgt.union(src).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )
    match_schema = pa.schema(
        [("_path", pa.string()), ("_pos", pa.int64()), ("_ntok", pa.int64())]
    )

    def match(g: pa.Table) -> pa.Table:
        is_src = g["_src"].to_numpy(zero_copy_only=False) == 1
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        src_ids = np.unique(ids[is_src])
        if not len(src_ids) or is_src.all():
            return match_schema.empty_table()
        tgt_ids = ids[~is_src]
        li = np.searchsorted(src_ids, tgt_ids, side="left")
        li = np.minimum(li, len(src_ids) - 1)
        hit = src_ids[li] == tgt_ids
        if not hit.any():
            return match_schema.empty_table()
        sub = g.filter(pa.array(~is_src)).filter(pa.array(hit))
        return sub.select(["_path", "_pos", "_ntok"])

    matched = both.groupby("_bucket").map_groups(match, batch_format="pyarrow")

    # per-fragment facts the DV writer needs; ray.put once — a million-
    # fragment table would otherwise pickle the dict into every task
    info_ref = ray.put(
        {f.path: (f.dv_path or "", f.rows) for f in hit_frags}
    )
    res_schema = pa.schema(
        [
            ("_path", pa.string()),
            ("dv_path", pa.string()),
            ("dv_rows_total", pa.int64()),
            ("rows_matched", pa.int64()),
            ("dv_n_tok_delta", pa.int64()),
            ("full_delete", pa.bool_()),
        ]
    )

    def write_dvs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return res_schema.empty_table()
        info = ray.get(info_ref)
        path = g["_path"][0].as_py()
        dv_rel, phys_rows = info[path]
        new_pos = np.unique(g["_pos"].to_numpy(zero_copy_only=False)).astype(
            np.uint64
        )
        old = (
            _dvmod.read_dv(table_dir, dv_rel) if dv_rel else np.empty(0, np.uint64)
        )
        merged = np.union1d(old, new_pos)
        full = len(merged) == phys_rows
        ntok_delta = int(pc.sum(g["_ntok"]).as_py() or 0)
        dv_out = "" if full else _dvmod.write_dv(table_dir, path, merged)
        return pa.table(
            {
                "_path": [path],
                "dv_path": [dv_out],
                "dv_rows_total": [len(merged)],
                "rows_matched": [g.num_rows],
                "dv_n_tok_delta": [ntok_delta],
                "full_delete": [full],
            },
            schema=res_schema,
        )

    rows = matched.groupby("_path").map_groups(
        write_dvs, batch_format="pyarrow"
    ).take_all()
    return {
        r["_path"]: {
            "dv_path": r["dv_path"] or None,
            "dv_rows_total": int(r["dv_rows_total"]),
            "rows_matched": int(r["rows_matched"]),
            "dv_n_tok_delta": int(r["dv_n_tok_delta"]),
            "full_delete": bool(r["full_delete"]),
        }
        for r in rows
    }


def merge_into(
    table: Table,
    source: ray.data.Dataset,
    job_id: str | None = None,
    strategy: str = "auto",
    mode: str = "cow",
    when_matched: str = "update",
    expected_parent: int | None = None,
) -> int:
    """Upsert ``source`` into ``table`` on ``doc_id``; returns the new
    version. ``strategy``: "broadcast", "shuffle" or "auto".

    ``expected_parent`` pins the merge to a specific snapshot: the
    whole plan (prune, rewrite, commit) runs against that version and
    the optimistic commit fails loudly (``CommitError``) if any other
    writer committed meanwhile. Read-compute-write callers whose
    SOURCE was derived from a scan (e.g. ``ops/windowdedup.py``) need
    this — under the default (latest at entry) a concurrent DELETE
    landing between their scan and the merge would make the stale
    source row unmatched, and the upsert would re-insert it.

    ``mode="cow"`` (default) rewrites hit fragments without the
    matched rows; ``mode="dv"`` masks the matched rows behind
    deletion-vector sidecars instead — the merge writes O(source +
    matched positions) bytes, never O(hit-fragment bytes), which is
    the only shape that stays cheap when a small upsert lands on a
    100 TB table. Scans pay a transient per-fragment mask until
    compaction materializes the DVs (``ops/compact.py``).

    ``when_matched="update"`` (default) is the upsert: matched target
    rows are replaced by their source rows and unmatched source rows
    are inserted. ``when_matched="delete"`` applies the source as a
    TOMBSTONE FEED (``MERGE ... WHEN MATCHED THEN DELETE``): matched
    target rows are removed, NO source row is ever written, and the
    source may carry only ``doc_id`` — the CDC shape for applying an
    upstream delete stream. Unmatched source keys are ignored."""
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"unknown when_matched {when_matched!r} (update | delete)"
        )
    if _fs.is_process_local(table.table_dir):
        raise ValueError(
            "merge_into rewrites fragments from Ray worker processes; "
            "memory:// is process-local — use a shared protocol "
            "(local path, file://, s3://)"
        )
    cfg = table.config
    parent = (
        table.latest_version() if expected_parent is None else expected_parent
    )
    job_id = job_id or f"merge-v{parent}"
    phase_t: dict[str, float] = {}
    t_last = time.perf_counter()

    def mark(phase: str) -> None:
        nonlocal t_last
        now = time.perf_counter()
        phase_t[phase] = round(now - t_last, 3)
        t_last = now

    # Materialize the raw source once (the object store holds and
    # spills it — never the driver heap), then size the dedup bucket
    # count from its actual bytes: map_groups materializes ONE bucket
    # per call, so a bucket must fit a worker heap — a fixed count
    # would make 40 GB buckets out of a 10 TB source.
    src_m = source.materialize()
    src_raw_bytes = max(src_m.size_bytes() or 1, 1)
    num_buckets = int(
        max(cfg.merge_num_buckets, -(-src_raw_bytes // (256 * 1024 * 1024)))
    )
    # Materialize the deduped source too: both strategies consume it
    # twice (keys + fragment write, or min/max + union); a second lazy
    # execution would re-run the dedup shuffle. count() is then free.
    # commit-time invariants run on the deduped SOURCE rows (the only
    # new values a merge introduces); a violation fails here, before
    # any rewrite task or manifest mutation (ops/constraints.py).
    # Tombstone feeds (when_matched="delete") insert NOTHING — their
    # key-only rows must not be constraint-checked (a not_null on any
    # other column would deterministically reject every delete-merge).
    deduped = _dedup_source(src_m, num_buckets)
    if when_matched != "delete":
        deduped = table._constrained(deduped)
    deduped = deduped.materialize()
    n_src = deduped.count()
    mark("dedup")
    if n_src == 0:
        return parent

    if strategy == "auto":
        strategy = "broadcast" if n_src <= cfg.merge_broadcast_max_keys else "shuffle"

    # the TABLE's schema (not the canonical default) governs every
    # projection below: user tables with extra columns round-trip.
    # fill_missing covers ONLY evolution-added columns (those recorded
    # in column_defaults by add_column): a source written before an
    # add-column merges cleanly (padded with the default / null), but
    # a source missing a CORE column still trips normalize_batch's
    # missing-column guard instead of being silently null-padded.
    tbl_schema = table.schema(parent)
    _defaults = table.manifest(parent).column_defaults
    fill_missing = {
        n: _defaults.get(n)
        for n in tbl_schema.names
        if n != "doc_id" and n in _defaults
    }

    # Pack the source-side fragments to target size instead of one tiny
    # fragment per dedup bucket (the groupby emits ~num_buckets blocks
    # regardless of how small the source is).
    src_bytes = max(deduped.size_bytes() or 1, 1)
    rows_per_frag = max(
        1, int(n_src * min(cfg.target_fragment_bytes / src_bytes, 1.0))
    )

    m = table.manifest(parent)

    if mode == "dv":
        return _merge_into_dv(
            table, deduped, n_src, parent, job_id, strategy, num_buckets,
            tbl_schema, fill_missing, rows_per_frag, m, phase_t, mark,
            when_matched,
        )
    if mode != "cow":
        raise ValueError(f"unknown merge mode {mode!r} (cow | dv)")

    if strategy == "broadcast":
        # broadcast as (sorted uint64 hashes, fixed-width utf-8 bytes
        # aligned): single-buffer arrays, compact on the wire and free
        # of per-element objects to deserialize (see
        # _rewrite_fragment_task); the lex-sorted byte array stays on
        # the driver for zone-map pruning
        kb_lex, h_sorted, key_bytes = _collect_broadcast_keys(deduped)
        if len(h_sorted) == 0:
            return parent
        keys_ref = ray.put((h_sorted, key_bytes))
        # key-set identity for lineage reuse (sorted hashes → stable)
        import hashlib as _hl

        keys_digest = _hl.md5(h_sorted.tobytes()).hexdigest()[:16]
        mark("collect_keys")

        # zone-map prune: fragment is "hit" iff some key falls in its range
        hit, kept = [], []
        for f in m.fragments:
            zm = f.zone_map.get("doc_id")
            if zm is None or f.rows == 0:
                hit.append(f)
            elif _zone_overlaps_keys(kb_lex, zm["min"], zm["max"]):
                hit.append(f)
            else:
                kept.append(f)

        # sliding-window fan-out: one task per hit fragment, at most
        # copy_concurrency_cap in flight (pure-copy phases anti-scale
        # past memory-bus saturation — see ops/_fanout.py)
        records = _fanout.run_capped(
            _rewrite_fragment_task,
            [
                (
                    table.table_dir, job_id, i, f.path, keys_ref,
                    cfg.bloom_bits_per_key, keys_digest, f.dv_path,
                    mf_recon(f, m.column_ids),
                )
                for i, f in enumerate(hit)
            ],
            _fanout.copy_concurrency_cap(cfg.memcpy_max_concurrency),
        )
        mark("rewrite_fragments")
        # a bloom-skipped fragment was proven key-free inside its task:
        # keep the ORIGINAL meta (no rewrite happened, nothing removed)
        bloom_skipped = [
            f for f, rec in zip(hit, records) if rec["metrics"].get("bloom_skip")
        ]
        hit = [f for f, rec in zip(hit, records) if not rec["metrics"].get("bloom_skip")]
        kept.extend(bloom_skipped)
        # COW output is 1:1 with its input fragment → a bucketed
        # layout (ops/bucket.py) survives the rewrite via the tag
        bucket_of = {f.path: (f.bucket, f.bucket_sig) for f in m.fragments}
        survivors = []
        for rec in records:
            if rec["metrics"].get("bloom_skip"):
                continue
            b, sig = bucket_of.get(rec["input_fragments"][0], (None, None))
            for fm in lineage.output_fragments(rec):
                fm.bucket, fm.bucket_sig = b, sig
                survivors.append(fm)

        if when_matched == "delete":
            src_frags = []  # tombstone feed: matched rows drop, nothing lands
        else:
            normed = deduped.map_batches(
                lambda b: normalize_batch(b, tbl_schema, fill_missing),
                batch_format="pyarrow",
            )
            from fupi_ray.ops import bucket as _bk

            lay = _bk.preserving_layout(table, "doc_id")
            if lay:
                # bucketed target: insert fragments land bucket-pure
                # and tagged, so the shuffle-free-join contract
                # survives the MERGE (one small sort of the source)
                src_frags = _bk.write_bucketized_fragments(
                    table, normed, "doc_id", lay["num_buckets"], f"mg-{job_id}-src"
                )
            else:
                src_frags = write_dataset_fragments(
                    normed,
                    table.table_dir,
                    f"mg-{job_id}-src",
                    target_fragment_rows=rows_per_frag,
                    bloom_bits=cfg.bloom_bits_per_key,
                    row_group_rows=cfg.row_group_rows,
                )
            mark("write_source")
        removed = {f.path for f in hit}
        new_frags = survivors + src_frags
        stats = {
            "strategy": "broadcast",
            "when_matched": when_matched,
            "phase_seconds": phase_t,
            "source_keys": int(len(h_sorted)),
            "fragments_hit": len(hit),
            "fragments_bloom_skipped": len(bloom_skipped),
            "fragments_untouched": len(kept),
        }
    else:
        hit = _source_range_hit_fragments(deduped, m)
        if hit is None:
            return parent
        hit_bytes = sum(f.bytes for f in hit) + src_bytes
        hit_rows = sum(f.live_rows for f in hit) + n_src
        merged_rows_per_frag = max(
            1, int(hit_rows * min(cfg.target_fragment_bytes / max(hit_bytes, 1), 1.0))
        )
        # resolve buckets see target + source rows: size by both sides
        resolve_buckets = int(
            max(num_buckets, -(-hit_bytes // (256 * 1024 * 1024)))
        )
        new_frags = _merge_shuffle(
            table,
            hit,
            deduped,
            parent,
            job_id,
            resolve_buckets,
            rows_per_frag=merged_rows_per_frag,
            tbl_schema=tbl_schema,
            fill_missing=fill_missing,
            when_matched=when_matched,
        )
        mark("shuffle_resolve")
        removed = {f.path for f in hit}
        stats = {
            "strategy": "shuffle",
            "when_matched": when_matched,
            "phase_seconds": phase_t,
            "fragments_hit": len(hit),
            "fragments_untouched": len(m.fragments) - len(hit),
        }

    if when_matched == "delete" and not removed and not new_frags:
        return parent  # tombstone feed matched nothing: no-op, no commit
    return table.commit_fragment_swap(
        removed, new_frags, operation="merge", expected_parent=parent, properties=stats
    )


def _merge_into_dv(
    table: Table,
    deduped: ray.data.Dataset,
    n_src: int,
    parent: int,
    job_id: str,
    strategy: str,
    num_buckets: int,
    tbl_schema: pa.Schema,
    fill_missing: dict,
    rows_per_frag: int,
    m,
    phase_t: dict,
    mark,
    when_matched: str = "update",
) -> int:
    """Driver half of the merge-on-read MERGE INTO: matched target
    rows become deletion-vector positions (broadcast probe of the key
    column, or the position-join exchange above the broadcast budget);
    source rows land as new fragments; one atomic manifest swap
    replaces hit fragments' metas with DV-carrying copies. Old
    snapshots keep pointing at the old (or no) DV — time travel and
    pinned readers are untouched. ``when_matched="delete"`` writes the
    DVs but NO source fragments: the cheapest possible delete stream —
    O(matched positions) bytes end to end."""
    import dataclasses

    cfg = table.config

    def probeable(f: FragmentMeta) -> bool:
        # a fragment that physically lacks doc_id (pre-evolution) or
        # has no rows can never match a source key
        return f.rows > 0 and (f.cols is None or "doc_id" in f.cols)

    candidates = [f for f in m.fragments if probeable(f)]

    if strategy == "broadcast":
        kb_lex, h_sorted, key_bytes = _collect_broadcast_keys(deduped)
        if len(h_sorted) == 0:
            return parent
        keys_ref = ray.put((h_sorted, key_bytes))
        import hashlib as _hl

        keys_digest = _hl.md5(h_sorted.tobytes()).hexdigest()[:16]
        mark("collect_keys")

        hit = []
        for f in candidates:
            zm = f.zone_map.get("doc_id")
            if zm is None or _zone_overlaps_keys(kb_lex, zm["min"], zm["max"]):
                hit.append(f)
        # key-column reads + tiny sidecar writes: not memory-bus-bound
        # copies, no fan-out cap needed (same shape as the DV DELETE)
        records = ray.get(
            [
                _dv_merge_task.remote(
                    table.table_dir,
                    job_id,
                    i,
                    f.path,
                    f.dv_path,
                    None
                    if f.cols is None
                    else [c for c in f.cols if c in ("doc_id", "n_tok")],
                    keys_ref,
                    keys_digest,
                )
                for i, f in enumerate(hit)
            ]
        )
        mark("dv_probe")
        per_path = {
            f.path: r["metrics"]
            for f, r in zip(hit, records)
            if not r["metrics"].get("unchanged")
        }
        extra = {
            "strategy": "broadcast",
            "source_keys": int(len(h_sorted)),
            "fragments_hit": len(hit),
            "fragments_bloom_skipped": sum(
                1 for r in records if r["metrics"].get("bloom_skip")
            ),
        }
    else:
        per_path = _merge_dv_shuffle_positions(
            table, candidates, deduped, num_buckets, job_id
        )
        mark("dv_position_join")
        extra = {"strategy": "shuffle", "fragments_hit": len(candidates)}

    frag_by_path = {f.path: f for f in m.fragments}
    removed: set[str] = set()
    added: list[FragmentMeta] = []
    rows_matched = 0
    for path, met in per_path.items():
        f = frag_by_path[path]
        removed.add(path)
        rows_matched += int(met["rows_matched"])
        if not met.get("full_delete"):
            added.append(
                dataclasses.replace(
                    f,
                    dv_path=met["dv_path"],
                    dv_rows=int(met["dv_rows_total"]),
                    dv_n_tok=f.dv_n_tok + int(met["dv_n_tok_delta"]),
                )
            )

    if when_matched == "delete":
        src_frags = []
    else:
        normed = deduped.map_batches(
            lambda b: normalize_batch(b, tbl_schema, fill_missing),
            batch_format="pyarrow",
        )
        from fupi_ray.ops import bucket as _bk

        lay = _bk.preserving_layout(table, "doc_id")
        if lay:
            # bucketed target: DV-merge source fragments land
            # bucket-pure (the DV'd originals keep their tags via
            # dataclasses.replace), so the layout survives mode="dv"
            src_frags = _bk.write_bucketized_fragments(
                table, normed, "doc_id", lay["num_buckets"], f"mg-{job_id}-src"
            )
        else:
            src_frags = write_dataset_fragments(
                normed,
                table.table_dir,
                f"mg-{job_id}-src",
                target_fragment_rows=rows_per_frag,
                bloom_bits=cfg.bloom_bits_per_key,
                row_group_rows=cfg.row_group_rows,
            )
        mark("write_source")
    stats = {
        "mode": "dv",
        "when_matched": when_matched,
        "phase_seconds": phase_t,
        "rows_matched": int(rows_matched),
        "fragments_dv": sum(
            1 for met in per_path.values() if not met.get("full_delete")
        ),
        "fragments_dropped": sum(
            1 for met in per_path.values() if met.get("full_delete")
        ),
        **extra,
    }
    if when_matched == "delete" and not removed and not src_frags:
        return parent  # tombstone feed matched nothing: no-op, no commit
    return table.commit_fragment_swap(
        removed,
        added + src_frags,
        operation="merge",
        expected_parent=parent,
        properties=stats,
    )


# ---------------------------------------------------------------------------
# insert_missing: MERGE ... WHEN NOT MATCHED THEN INSERT (idempotent ingest)
# ---------------------------------------------------------------------------


@ray.remote
def _probe_fragment_task(
    table_dir: str, rel_path: str, keys_ref, dv_rel: str | None, recon: dict
) -> np.ndarray:
    """Which broadcast keys already exist in this fragment: bloom
    sidecar early-exit (no Parquet read at all when provably key-free),
    else a doc_id-column-only masked read + vectorized probe. Returns
    matched key POSITIONS (small: bounded by the source key count)."""
    key_hashes, key_bytes = keys_ref
    abs_path = _fs.join(table_dir, rel_path)
    blob = bloom.read_sidecar(abs_path)
    if blob is not None and not bloom.may_contain_any(blob, key_hashes):
        return np.empty(0, np.int64)
    rmap = (recon or {}).get("rmap") or {}
    inv = {d: p for p, d in rmap.items()}
    phys = inv.get("doc_id", "doc_id")
    from fupi_ray.ops.dv import masked_fragment_table

    tbl = masked_fragment_table(table_dir, rel_path, dv_rel or None, columns=[phys])
    ids = tbl[phys].to_numpy(zero_copy_only=False)
    pos, _ = _probe_key_run_positions(ids, key_hashes, key_bytes)
    return np.unique(pos[pos >= 0])


def insert_missing(
    table: Table,
    source: ray.data.Dataset,
    job_id: str | None = None,
    expected_parent: int | None = None,
) -> dict:
    """``MERGE INTO table USING source WHEN NOT MATCHED THEN INSERT``:
    append only the source rows whose ``doc_id`` is absent from the
    table — the idempotent-ingest / dedup-append primitive (re-running
    a crashed ingest feed never duplicates rows). Matched target rows
    are untouched: NO fragment is ever rewritten, so the op writes
    O(missing rows) bytes regardless of table size.

    Scale shape: the deduped source key set broadcasts once
    (``ray.put`` of sorted-hash + fixed-width-byte arrays); existence
    probes fan out one capped task per zone-map-surviving fragment,
    each answering from the bloom sidecar alone when it can (no read),
    else from a doc_id-column-only masked read — the table's payload
    columns never move. Above ``merge_broadcast_max_keys`` the probe
    flips to one hash-shuffle anti-join between the source and the
    pruned key column. Commit is an append pinned to
    ``expected_parent`` (default: latest at entry): a concurrent
    commit fails this op loudly instead of risking a double insert —
    re-run to retry against the new snapshot.

    Returns ``{version, rows_inserted, rows_skipped}``; ``version`` is
    unchanged when every source key already exists.
    """
    if _fs.is_process_local(table.table_dir):
        raise ValueError(
            "insert_missing probes fragments from Ray worker processes; "
            "memory:// is process-local — use a shared protocol"
        )
    cfg = table.config
    parent = (
        table.latest_version() if expected_parent is None else expected_parent
    )
    job_id = job_id or f"insmiss-v{parent}"
    src_m = source.materialize()
    src_raw_bytes = max(src_m.size_bytes() or 1, 1)
    num_buckets = int(
        max(cfg.merge_num_buckets, -(-src_raw_bytes // (256 * 1024 * 1024)))
    )
    deduped = table._constrained(_dedup_source(src_m, num_buckets)).materialize()
    n_src = deduped.count()
    if n_src == 0:
        return {"version": parent, "rows_inserted": 0, "rows_skipped": 0}
    m = table.manifest(parent)

    if n_src <= cfg.merge_broadcast_max_keys:
        kb_lex, h_sorted, key_bytes = _collect_broadcast_keys(deduped)
        keys_ref = ray.put((h_sorted, key_bytes))
        # zone-map prune exactly like the broadcast merge: a fragment
        # whose [min,max] range contains no key cannot hold a match
        hit = []
        for f in m.fragments:
            zm = f.zone_map.get("doc_id")
            if zm is None or f.rows == 0:
                if f.rows:
                    hit.append(f)
                continue
            if _zone_overlaps_keys(kb_lex, zm["min"], zm["max"]):
                hit.append(f)
        results = _fanout.run_capped(
            _probe_fragment_task,
            [
                (table.table_dir, f.path, keys_ref, f.dv_path, mf_recon(f, m.column_ids))
                for f in hit
            ],
            _fanout.copy_concurrency_cap(cfg.memcpy_max_concurrency),
        )
        matched = np.zeros(len(h_sorted), dtype=bool)
        for pos in results:
            if len(pos):
                matched[pos] = True
        n_matched = int(matched.sum())
        if n_matched == n_src:
            return {"version": parent, "rows_inserted": 0, "rows_skipped": n_src}
        # broadcast only the bool mask; the (dominant) key arrays are
        # already in the object store as keys_ref — reuse them
        mask_ref = ray.put(matched)

        def drop_matched(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            kh, kb = ray.get(keys_ref)
            mm = ray.get(mask_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            # every source id IS a key (keys were collected from this
            # very dataset); a row drops when its key position probed
            # matched in some fragment
            pos, _ = _probe_key_run_positions(ids, kh, kb)
            sel = pos >= 0
            keep = np.ones(len(ids), dtype=bool)
            keep[sel] = ~mm[pos[sel]]
            return batch.filter(pa.array(keep))

        missing = deduped.map_batches(drop_matched, batch_format="pyarrow")
        probe_stats = {
            "strategy": "broadcast",
            "fragments_probed": len(hit),
            "fragments_untouched": len(m.fragments) - len(hit),
        }
    else:
        # shuffle path: exact anti-join between the source and the
        # doc_id column of range-overlapping fragments only
        from fupi_ray.ops.join import hash_join

        hit = _source_range_hit_fragments(deduped, m) or []
        if hit:
            existing = table.scan_fragments(m, hit, columns=["doc_id"])
            missing = hash_join(deduped, existing, on="doc_id", how="anti")
        else:
            # no fragment's range overlaps any key: every source row is
            # new (the common bulk-ingest shape — a feed of fresh keys
            # above the table's current range)
            missing = deduped
        probe_stats = {
            "strategy": "shuffle",
            "fragments_probed": len(hit),
            "fragments_untouched": len(m.fragments) - len(hit),
        }

    tbl_schema = table.schema(parent)
    _defaults = m.column_defaults
    fill_missing = {
        n: _defaults.get(n)
        for n in tbl_schema.names
        if n != "doc_id" and n in _defaults
    }
    normed = missing.map_batches(
        lambda b: normalize_batch(b, tbl_schema, fill_missing),
        batch_format="pyarrow",
    ).materialize()
    n_ins = normed.count()
    if n_ins == 0:
        return {"version": parent, "rows_inserted": 0, "rows_skipped": n_src}
    src_bytes = max(normed.size_bytes() or 1, 1)
    rows_per_frag = max(
        1, int(n_ins * min(cfg.target_fragment_bytes / src_bytes, 1.0))
    )
    from fupi_ray.ops import bucket as _bk

    lay = _bk.preserving_layout(table, "doc_id")
    if lay:
        new_frags = _bk.write_bucketized_fragments(
            table, normed, "doc_id", lay["num_buckets"], f"im-{job_id}-src"
        )
    else:
        new_frags = write_dataset_fragments(
            normed,
            table.table_dir,
            f"im-{job_id}-src",
            target_fragment_rows=rows_per_frag,
            bloom_bits=cfg.bloom_bits_per_key,
            row_group_rows=cfg.row_group_rows,
        )
    stats = dict(probe_stats)
    stats.update({"rows_inserted": n_ins, "rows_skipped": n_src - n_ins})
    version = table.commit_fragment_swap(
        set(), new_frags, operation="insert-missing",
        expected_parent=parent, properties=stats,
    )
    return {
        "version": version,
        "rows_inserted": n_ins,
        "rows_skipped": n_src - n_ins,
    }
