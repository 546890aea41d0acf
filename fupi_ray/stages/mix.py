"""Token-budget source mixing: deterministic per-source document
selection under a TOKEN budget — the data-mixing primitive a training
pipeline uses to hit a recipe like "300B tokens: 40% web, 30% code,
30% wiki" (reference corpus assembly is a single driver-side concat,
searcher.py:498-505; at 100 TB the mix must be computed distributed).

Semantics: for each source, keep the documents that form the maximal
PREFIX of the (hash(doc_id), doc_id)-ordered stream whose cumulative
token count stays within the source's budget. Content-addressed like
the exact-N sampler: the same documents are chosen regardless of
cluster size, block layout, or rerun — and the selection is expressible
in SQL (``SUM(...) OVER (PARTITION BY source ORDER BY md5(id), id)``),
so the driver oracle can verify it bit-exactly.

Scale shape — a global per-source running sum WITHOUT a global sort:

1. **Histogram pass** (streaming, O(blocks x buckets) exchange): each
   batch collapses to per-(source, hash-bucket) token sums; the driver
   folds them into one ``sources x num_buckets`` table.
2. **Driver cutoff** (tiny): per source, a cumulative sum over the
   ordered buckets finds the boundary bucket where the budget crosses.
   Everything below it is kept outright, everything above dropped.
3. **Boundary resolve** (tiny collect): only the boundary bucket's
   rows (~corpus/num_buckets) ship (key, id, tokens) to the driver,
   which finishes the prefix exactly.
4. **Filter pass** (streaming): keep = bucket < cutoff OR id in the
   boundary keep-set (broadcast once via ``ray.put``).

Total driver traffic is histograms + one bucket's keys — never rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fupi_ray.functions.hashing import stable_hash

__all__ = ["token_budget_mix"]


def _per_source(src_col, fn) -> np.ndarray:
    """Vectorized per-row value from a per-SOURCE function: dictionary-
    encode the source column, evaluate ``fn`` once per distinct source,
    gather — O(distinct) python calls per batch, never per row."""
    src = src_col
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    enc = pc.dictionary_encode(src)
    uniq = enc.dictionary.to_pylist()
    idx = enc.indices
    if idx.null_count:
        uniq.append(None)
        idx = idx.fill_null(len(uniq) - 1)
    per_code = np.array([fn(s) for s in uniq], dtype=np.int64)
    return per_code[idx.to_numpy(zero_copy_only=False)]


def _order_u32(ids, hash_fn: str) -> np.ndarray:
    """The mix's order key as uint32. ``md5``: first 8 hex digits of
    md5(str(id)) — bit-identical to the duckdb oracle's ORDER BY
    md5(...) prefix (per-row hashlib: oracle-parity path, use for
    conformance). ``fast``: vectorized siphash — identical contract,
    production default."""
    if hash_fn == "md5":
        import hashlib

        return np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                for i in ids.to_pylist()
            ],
            dtype=np.uint32,
        )
    arr = ids.to_numpy(zero_copy_only=False)
    return (stable_hash(arr) >> np.uint64(32)).astype(np.uint32)


def token_budget_mix(
    ds: ray.data.Dataset,
    budgets: dict[str, int],
    default_budget: int | None = None,
    token_col: str = "n_tok",
    source_col: str = "source",
    id_col: str = "doc_id",
    hash_fn: str = "fast",
    num_buckets: int = 4096,
) -> ray.data.Dataset:
    """Select documents so each source's total ``token_col`` stays
    within its budget (see module docstring for semantics + shape).
    ``default_budget`` applies to sources absent from ``budgets``;
    None means such sources pass through untouched (no budget).
    ``num_buckets`` bounds the boundary collect at ~corpus/num_buckets
    rows — raise it for very large corpora."""
    if hash_fn not in ("md5", "fast"):
        raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | fast)")

    def budget_of(s) -> int | None:
        b = budgets.get(s, default_budget)
        return None if b is None else int(b)

    shift = 32 - int(num_buckets - 1).bit_length()
    if (1 << (32 - shift)) != num_buckets:
        raise ValueError("num_buckets must be a power of two")

    # -- pass 1: per-(source, bucket) token histograms ----------------------
    def hist(batch: pa.Table) -> pa.Table:
        u = _order_u32(batch[id_col], hash_fn)
        b = (u >> np.uint32(shift)).astype(np.int32)
        t = pa.table(
            {
                "s": batch[source_col],
                "b": pa.array(b),
                "tok": pc.cast(batch[token_col], pa.int64()),
            }
        )
        g = t.group_by(["s", "b"]).aggregate([("tok", "sum")])
        return pa.table({"s": g["s"], "b": g["b"], "tok": g["tok_sum"]})

    parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
    agg: dict[str, np.ndarray] = {}
    for r in parts:
        h = agg.setdefault(r["s"], np.zeros(num_buckets, dtype=np.int64))
        h[r["b"]] += int(r["tok"])

    # -- pass 2 (driver, tiny): per-source bucket cutoffs --------------------
    # cutoff[s] = first bucket whose inclusion would exceed the budget;
    # buckets < cutoff are kept whole, bucket == cutoff resolves exactly
    cutoffs: dict[str, int] = {}
    boundary_room: dict[str, int] = {}
    for s, h in agg.items():
        budget = budget_of(s)
        if budget is None:
            cutoffs[s] = num_buckets  # no budget: keep everything
            continue
        cum = np.cumsum(h)
        over = np.nonzero(cum > budget)[0]
        if not len(over):
            cutoffs[s] = num_buckets
            continue
        b_star = int(over[0])
        cutoffs[s] = b_star
        boundary_room[s] = int(budget - (cum[b_star - 1] if b_star else 0))

    # -- pass 3: exact prefix inside each boundary bucket --------------------
    kept_boundary: set = set()
    if boundary_room:
        b_of = {s: c for s, c in cutoffs.items() if s in boundary_room}

        def boundary_rows(batch: pa.Table) -> pa.Table:
            u = _order_u32(batch[id_col], hash_fn)
            b = (u >> np.uint32(shift)).astype(np.int64)
            target = _per_source(batch[source_col], lambda s: b_of.get(s, -1))
            mask = b == target
            sub = batch.filter(pa.array(mask))
            return pa.table(
                {
                    "s": sub[source_col],
                    "u": pa.array(u[mask].astype(np.int64)),
                    "id": sub[id_col],
                    "tok": pc.cast(sub[token_col], pa.int64()),
                }
            )

        rows = ds.map_batches(boundary_rows, batch_format="pyarrow").take_all()
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["s"], []).append(r)
        for s, rs in by_src.items():
            rs.sort(key=lambda r: (r["u"], r["id"]))
            room = boundary_room[s]
            for r in rs:
                if r["tok"] > room:
                    break
                room -= r["tok"]
                kept_boundary.add(r["id"])

    # -- pass 4: streaming filter --------------------------------------------
    # broadcast once: at 10^10 rows / 4096 buckets the boundary set is
    # ~10^6 ids per source — object store, not task closure
    kept_ref = ray.put(kept_boundary)
    cut_ref = ray.put(cutoffs)

    def keep(batch: pa.Table) -> pa.Table:
        cut = ray.get(cut_ref)
        kept = ray.get(kept_ref)
        u = _order_u32(batch[id_col], hash_fn)
        b = (u >> np.uint32(shift)).astype(np.int64)
        lim = _per_source(batch[source_col], lambda s: cut.get(s, num_buckets))
        mask = b < lim
        if kept:
            on_edge = b == lim
            if on_edge.any():
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                mask = mask | (on_edge & np.isin(ids, list(kept)))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
