"""Storage-bucketed layout + shuffle-free co-partitioned joins.

The reference joins document fragments to their parent metadata through
LanceDB's implicit row alignment (searcher.py:207-246 reads both sides
of one Lance table version); every distributed equivalent of that read
is a join, and at 100 TB a repeated hash join re-shuffles both tables
on every run. This module amortizes the exchange into the LAYOUT —
Spark/Iceberg's bucketed tables / storage-partitioned join:

- ``bucket_table`` rewrites a table so every fragment holds rows of
  exactly one hash bucket (``stable_hash(key) % num_buckets``) and
  records the layout contract. ONE all-to-all, ever.
- ``bucket_join`` joins two co-bucketed tables with NO exchange: one
  Ray task per bucket reads both sides' fragments for that bucket and
  joins in memory. Wall-clock and network are O(data read), not
  O(data shuffled); each task's memory is bounded by the largest
  bucket, which the caller controls through ``num_buckets``
  (size buckets so left+right bucket bytes fit a worker's heap).

Layout survival: deletion-vector mutations preserve fragment metas
(``dataclasses.replace``), compaction packs within a bucket (never
across), COW rewrites carry the input fragment's tag, and MERGE
routes its insert/resolve writes through the bucketized writer when
the target is bucketed on the merge key — so routine maintenance
keeps the contract. A raw APPEND of untagged fragments breaks it;
``bucket_join`` then raises ``BucketLayoutError`` instead of silently
producing a wrong or slow join (re-run ``bucket_table``, or ingest
through MERGE, which preserves the layout).
"""

from __future__ import annotations

import json
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fupi_ray import manifest as mf
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.manifest import FragmentMeta
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table, _FragmentWriter

BUCKET_COL = "_bucket"


class BucketLayoutError(RuntimeError):
    pass


def _layout_path(table_dir: str) -> str:
    return _fs.join(table_dir, "manifest", "bucket_layout.json")


def read_layout(table: Table) -> dict | None:
    """The table's bucket contract ({key, num_buckets, version}) or
    None. Stored as a manifest sidecar (like pins) because per-commit
    properties don't carry forward across later commits."""
    p = _layout_path(table.table_dir)
    if not _fs.exists(p):
        return None
    return json.loads(_fs.read_text(p))


class _BucketFragmentWriter:
    """map_batches callable over the bucket-sorted stream: splits each
    block at ``_bucket`` run boundaries and writes one fragment per
    run (runs are contiguous after the sort, so a block yields one or
    two fragments in the common case). Emits one meta row per fragment
    with the bucket tag embedded."""

    def __init__(
        self, table_dir: str, prefix: str, row_group_rows: int, bloom_bits, sig: str
    ):
        self._writer = _FragmentWriter(
            table_dir, prefix, row_group_rows=row_group_rows, bloom_bits=bloom_bits
        )
        self.sig = sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"meta_json": pa.array([], type=pa.string())})
        b = batch[BUCKET_COL].to_numpy(zero_copy_only=False)
        # run boundaries of the (sorted-within-block) bucket column
        cuts = np.flatnonzero(np.diff(b)) + 1
        starts = np.concatenate(([0], cuts))
        stops = np.concatenate((cuts, [len(b)]))
        payload = batch.drop_columns([BUCKET_COL])
        metas = []
        for s, e in zip(starts, stops):
            out = self._writer(payload.slice(s, e - s))
            d = json.loads(out["meta_json"][0].as_py())
            d["bucket"] = int(b[s])
            d["bucket_sig"] = self.sig
            metas.append(json.dumps(d))
        return pa.table({"meta_json": pa.array(metas, type=pa.string())})


def write_bucketized_fragments(
    table: Table,
    ds: ray.data.Dataset,
    key: str,
    num_buckets: int,
    prefix: str,
) -> list[FragmentMeta]:
    """Write a Dataset as bucket-pure, bucket-tagged fragments: assign
    ``stable_hash(key) % num_buckets``, range-sort on it (the one
    exchange), split blocks at run boundaries. The building block of
    ``bucket_table`` — and of layout-preserving writes (MERGE inserts
    into an already-bucketed table)."""

    def assign(batch: pa.Table) -> pa.Table:
        if batch[key].null_count:
            # a null bucket key is ill-defined for the layout (and
            # stable_hash's int path would coerce the whole batch to
            # float under nulls, hashing 5 differently from 5.0 —
            # silent bucket impurity). Refuse loudly instead.
            raise ValueError(
                f"bucket key {key!r} contains nulls ({batch[key].null_count} "
                "in one batch); bucket layouts require a non-null key"
            )
        h = stable_hash(batch[key])
        return batch.append_column(
            BUCKET_COL, pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    sorted_ds = ds.map_batches(assign, batch_format="pyarrow").sort(BUCKET_COL)
    writer = _BucketFragmentWriter(
        table.table_dir,
        prefix,
        row_group_rows=table.config.row_group_rows,
        bloom_bits=table.config.bloom_bits_per_key,
        sig=f"{key}%{num_buckets}",
    )
    meta_rows = sorted_ds.map_batches(
        writer, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    return [FragmentMeta.from_dict(json.loads(r["meta_json"])) for r in meta_rows]


def _parse_sig(sig: str) -> tuple[str, int]:
    key, _, n = sig.rpartition("%")
    return key, int(n)


def fragment_layout(m) -> dict | None:
    """The layout the LIVE FRAGMENTS unanimously carry — the source of
    truth for joins and layout-preserving writes. The sidecar file is
    advisory (repair parameters for ``maintain``); fragments survive
    rollbacks and crashes with their signatures intact, so deriving
    from them can never mix incompatible taggings silently."""
    frags = m.fragments
    if not frags:
        return None
    sigs = {f.bucket_sig for f in frags}
    if len(sigs) != 1 or None in sigs or any(f.bucket is None for f in frags):
        return None
    key, n = _parse_sig(next(iter(sigs)))
    return {"key": key, "num_buckets": n}


def preserving_layout(table: Table, merge_key: str) -> dict | None:
    """The table's bucket layout IF a write keyed on ``merge_key`` can
    preserve it (same key, every live fragment tagged with one
    unanimous signature) — the gate merge paths use to route inserts
    through the bucketized writer instead of breaking the contract."""
    lay = fragment_layout(table.manifest())
    if not lay or lay["key"] != merge_key:
        return None
    return lay


def bucket_table(
    table: Table, key: str = "doc_id", num_buckets: int = 16, incremental: bool = True
) -> int | None:
    """Rewrite the table into a hash-bucketed layout.

    Every output fragment holds rows of exactly one
    ``stable_hash(key) % num_buckets`` bucket, tagged in its manifest
    meta with the layout signature; the contract is persisted for
    ``bucket_join`` to verify. Scanning semantics are unchanged
    (content-preserving, like compaction); deletion vectors are
    materialized away by the rewrite. Returns the new version (None on
    an empty table).

    ``incremental`` (default): when SOME fragments already carry this
    exact signature, only the OTHERS are rewritten (untagged appends
    and different-signature leftovers alike) — repairing the layout
    after an append costs O(new data), not O(table), and the result
    always carries one unanimous signature. With ``incremental=False``
    or no matching fragment, everything is rewritten in one
    all-to-all, which at 100 TB is the entire point of paying once.
    """
    parent = table.latest_version()
    m = table.manifest(parent)
    if not m.fragments:
        return None
    if key not in (m.schema_names or []):
        raise ValueError(f"bucket key {key!r} not in table schema {m.schema_names}")
    t0 = time.perf_counter()
    sig = f"{key}%{num_buckets}"
    keep = [f for f in m.fragments if f.bucket_sig == sig and f.bucket is not None]
    keep_paths = {f.path for f in keep}
    redo = [f for f in m.fragments if f.path not in keep_paths]
    if incremental and keep and not redo:
        # already fully bucketed under this signature: refresh the
        # advisory sidecar, no new version
        mf._atomic_write(
            _layout_path(table.table_dir),
            json.dumps({"key": key, "num_buckets": num_buckets, "version": parent}),
        )
        return parent
    if not (incremental and keep):
        keep, redo = [], list(m.fragments)  # full rewrite
    ds = table.scan(parent, paths_subset={f.path for f in redo})
    new_frags = write_bucketized_fragments(
        table, ds, key, num_buckets, f"bk-v{parent}"
    )
    v = table.commit_fragment_swap(
        {f.path for f in redo},
        new_frags,
        operation="bucket",
        expected_parent=parent,
        properties={
            "bucket_key": key,
            "num_buckets": num_buckets,
            "fragments_out": len(new_frags),
            "fragments_kept": len(keep),
            "incremental": bool(keep),
            "seconds": round(time.perf_counter() - t0, 3),
        },
    )
    mf._atomic_write(
        _layout_path(table.table_dir),
        json.dumps({"key": key, "num_buckets": num_buckets, "version": v}),
    )
    return v


def _validate_side(table: Table, on: str, side: str):
    """Derive and validate the side's layout FROM ITS FRAGMENTS (the
    sidecar can be stale after a rollback across a re-bucket or a
    crash between commit and sidecar write; fragments cannot)."""
    m = table.manifest()
    untagged = [f.path for f in m.fragments if f.bucket is None or not f.bucket_sig]
    if untagged and len(untagged) == len(m.fragments):
        raise BucketLayoutError(
            f"{side} table has no bucket layout; run bucket_table"
        )
    if untagged:
        raise BucketLayoutError(
            f"{side} table has {len(untagged)} fragment(s) outside the bucket "
            f"layout (e.g. {untagged[0]}); re-run bucket_table after appends"
        )
    layout = fragment_layout(m)
    if layout is None:
        sigs = sorted({f.bucket_sig for f in m.fragments})
        raise BucketLayoutError(
            f"{side} table mixes bucket layouts {sigs} (rollback across a "
            "re-bucket?); re-run bucket_table"
        )
    if layout["key"] != on:
        raise BucketLayoutError(
            f"{side} table is bucketed by {layout['key']!r}, join key is {on!r}"
        )
    return m, layout


def bucket_join(
    left: Table,
    right: Table,
    on: str,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    how: str = "inner",
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Shuffle-free equi-join of two co-bucketed tables.

    One Ray task per bucket: reads that bucket's fragments from both
    sides (deletion vectors masked, renamed columns reconciled,
    evolution-padded to the declared schema) and joins them in memory
    with Arrow's join kernel. No all-to-all operator appears in the
    plan — the exchange already happened at ``bucket_table`` time.
    ``how`` is "inner" or "left" (left outer).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lm, llay = _validate_side(left, on, "left")
    rm, rlay = _validate_side(right, on, "right")
    if llay["num_buckets"] != rlay["num_buckets"]:
        raise BucketLayoutError(
            f"bucket counts differ: left {llay['num_buckets']} vs right {rlay['num_buckets']}"
        )
    n = llay["num_buckets"]

    lcols = list(columns_left) if columns_left is not None else list(lm.schema_names)
    rcols = list(columns_right) if columns_right is not None else list(rm.schema_names)
    for cols, side in ((lcols, "left"), (rcols, "right")):
        if on not in cols:
            raise ValueError(f"join key {on!r} missing from {side} columns {cols}")

    from fupi_ray.state import fragread

    def frag_specs(m, cols: list[str]) -> dict[int, list[dict]]:
        by_bucket: dict[int, list[dict]] = {}
        for f in m.fragments:
            by_bucket.setdefault(int(f.bucket), []).append(
                fragread.fragment_spec(f, m.column_ids, cols)
            )
        return by_bucket

    lspec = frag_specs(lm, lcols)
    rspec = frag_specs(rm, rcols)

    def declared_subset(m, cols: list[str]) -> tuple[list[str], list[str]]:
        types = dict(zip(m.schema_names, m.schema_types))
        return cols, [types[c] for c in cols]

    lnames, ltypes = declared_subset(lm, lcols)
    rnames, rtypes = declared_subset(rm, rcols)
    # unify the key type across sides (Acero refuses string vs
    # large_string, int32 vs int64, ...). Safe for co-partitioning:
    # stable_hash is width/offset-representation independent (strings
    # hash by value, ints via uint64), so both layouts already agree.
    lk, rk = mf.type_from_str(ltypes[lnames.index(on)]), mf.type_from_str(
        rtypes[rnames.index(on)]
    )
    if lk != rk:
        if pa.types.is_string(lk) or pa.types.is_large_string(lk):
            if not (pa.types.is_string(rk) or pa.types.is_large_string(rk)):
                raise BucketLayoutError(f"join key types differ: {lk} vs {rk}")
            unified = pa.large_string()
        elif pa.types.is_integer(lk) and pa.types.is_integer(rk):
            unified = lk if lk.bit_width >= rk.bit_width else rk
        else:
            raise BucketLayoutError(f"join key types differ: {lk} vs {rk}")
        ltypes[lnames.index(on)] = rtypes[rnames.index(on)] = str(unified)

    items = []
    for b in range(n):
        lfr, rfr = lspec.get(b, []), rspec.get(b, [])
        if not lfr:
            continue  # inner AND left: no left rows → no output rows
        if not rfr and how == "inner":
            continue
        items.append(
            {
                "spec": json.dumps(
                    {"bucket": b, "left": lfr, "right": rfr}, default=str
                )
            }
        )
    join_type = "inner" if how == "inner" else "left outer"
    ldir, rdir = left.table_dir, right.table_dir
    lfill = dict(lm.column_defaults or {})
    rfill = dict(rm.column_defaults or {})

    def run_bucket(batch: pa.Table) -> pa.Table:
        from fupi_ray.state.fragread import read_fragment_normalized

        def read_side(
            table_dir: str, frs: list[dict], names: list[str], types: list[str], fill
        ) -> pa.Table:
            parts = [
                read_fragment_normalized(table_dir, fr, names, types, fill)
                for fr in frs
            ]
            if not parts:
                return pa.schema(
                    [(nm, mf.type_from_str(t)) for nm, t in zip(names, types)]
                ).empty_table()
            return pa.concat_tables(parts, promote_options="default")

        outs = []
        for spec_s in batch["spec"].to_pylist():
            spec = json.loads(spec_s)
            lt = read_side(ldir, spec["left"], lnames, ltypes, lfill)
            rt = read_side(rdir, spec["right"], rnames, rtypes, rfill)
            outs.append(
                lt.join(
                    rt,
                    keys=on,
                    join_type=join_type,
                    right_suffix=right_suffix,
                    use_threads=False,
                )
            )
        return outs[0] if len(outs) == 1 else pa.concat_tables(
            outs, promote_options="default"
        )

    if not items:
        # empty join result with the declared output schema
        lsch = pa.schema([(nm, mf.type_from_str(t)) for nm, t in zip(lnames, ltypes)])
        rrest = [
            (nm + (right_suffix if nm in lnames else ""), mf.type_from_str(t))
            for nm, t in zip(rnames, rtypes)
            if nm != on
        ]
        return ray.data.from_arrow(pa.schema(list(lsch) + rrest).empty_table())
    return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        run_bucket, batch_format="pyarrow", batch_size=None
    )
