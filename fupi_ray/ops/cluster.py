"""Z-order / Hilbert clustering: interleaved sort key → global sort →
range-partitioned fragments with tight zone maps.

The reference's tables get data-skipping implicitly from Lance fragment
stats (SURVEY.md §2.5 note); our engine makes the layout explicit per
the north star: interleave bit-planes of ``(source, n_tok,
hash(doc_id))``, globally sort the table by the curve key (the one
all-to-all exchange this op fundamentally requires), and rewrite
fragments so each covers a small hyper-rectangle of the key space —
then zone-map pruning answers ``source = x AND n_tok BETWEEN a AND b``
scans by skipping most fragments.

Each dimension is **rank-encoded** before interleaving (source → dense
dictionary code, n_tok → quantile bucket, doc_id → uniform hash) so
the curve key space is uniformly occupied regardless of value skew —
linear quantization of a long-tailed ``n_tok`` would waste its bit
planes on empty range and every fragment would span the whole observed
range. The encodings come from ONE column-pruned statistics pass
(source + n_tok only — tokens payload untouched).

The key-interleave stage is the engine's analogue of the reference's
stateful embedding stage (fupi/embedders.py:35-63 — load once, apply
per batch, SURVEY.md §2.3 T1): an actor pool holding the broadcast
encodings, vectorized numpy bit-spreading per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

import threading

from fupi_ray.functions.hashing import hilbert_key, stable_hash, zorder_key
from fupi_ray.table import Table, write_dataset_fragments

_READ_LOCK = threading.Lock()

# Quantile resolution for the n_tok dimension: 2^12 buckets is far
# finer than any realistic fragment count; remaining low bits are
# filled from the value itself so ties inside a bucket still order.
_QUANTILE_BITS = 12


class KeyInterleaver:
    """Actor-pool map_batches stage: adds the space-filling-curve key.

    State built once per actor in ``__init__`` (the encodings arrive by
    broadcast handle — ``ray.put`` once on the driver, read once per
    actor, never re-shipped per batch)."""

    def __init__(self, enc_ref, curve: str = "zorder", bits: int = 21):
        enc = ray.get(enc_ref) if isinstance(enc_ref, ray.ObjectRef) else enc_ref
        self.codes: dict[str, int] = enc["codes"]
        self.boundaries: np.ndarray = np.asarray(enc["boundaries"], dtype=np.float64)
        self.curve = curve
        self.bits = bits
        n = max(len(self.codes), 2)
        self.code_scale = (1 << bits) // n
        # vectorized source→code probe, built once per actor: a sorted
        # Arrow value set for pc.index_in + a positional code array
        # (unknown sources take code 0, matching the old fillna(0))
        keys = sorted(self.codes)
        self._keyset = pa.array(keys)
        self._code_vals = np.array(
            [self.codes[k] for k in keys] or [0], dtype=np.uint64
        )

    def _encode_n_tok(self, n_tok: np.ndarray) -> np.ndarray:
        """Quantile bucket in the high bits, raw value in the low bits."""
        bucket = np.searchsorted(self.boundaries, n_tok, side="right").astype(np.uint64)
        hi = bucket << np.uint64(max(self.bits - _QUANTILE_BITS, 0))
        lo = np.asarray(n_tok, dtype=np.uint64) & np.uint64(
            (1 << max(self.bits - _QUANTILE_BITS, 0)) - 1
        )
        mask = np.uint64((1 << self.bits) - 1)
        return (hi | lo) & mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.fill_null(pc.index_in(batch["source"], value_set=self._keyset), 0)
        d0 = self._code_vals[idx.to_numpy(zero_copy_only=False).astype(np.int64)] * np.uint64(
            self.code_scale
        )
        d1 = self._encode_n_tok(batch["n_tok"].to_numpy(zero_copy_only=False))
        d2 = stable_hash(batch["doc_id"]) >> np.uint64(64 - self.bits)
        fn = hilbert_key if self.curve == "hilbert" else zorder_key
        key = fn(d0, d1, d2, bits=self.bits)
        return batch.append_column("_ckey", pa.array(key.astype(np.int64)))


def _column_stats(
    table: Table, version: int, frags: list | None = None,
    manifest_ids: dict | None = None,
) -> dict:
    """One column-pruned pass → source dictionary + n_tok quantiles.

    Per-block partial stats (distinct sources + a bounded n_tok
    sample) combine on the driver — the reduced stream is one tiny row
    per block, never the column itself. ``frags`` restricts the pass to
    those fragments (incremental reclustering keys only the delta, so
    its stats read only the delta — encodings need not match earlier
    runs: per-fragment zone-map pruning depends only on each output
    fragment's own key hyper-rectangle, never on cross-run key spaces).
    """
    import json

    def stats_fn(t: pa.Table) -> pa.Table:
        srcs = pc.unique(t["source"]).to_pylist()
        n = t["n_tok"].to_numpy(zero_copy_only=False)
        step = max(1, len(n) // 256)
        return pa.table(
            {
                "srcs": pa.array([json.dumps(sorted(srcs))]),
                "sample": pa.array([n[::step].tolist()], type=pa.list_(pa.int64())),
            }
        )

    if frags is None:
        ds = table.scan(version, columns=["source", "n_tok"])
    else:
        from fupi_ray.ops import dv as _dvmod

        with _READ_LOCK:
            ds = _dvmod.fragments_dataset(
                table.table_dir,
                frags,
                columns=["source", "n_tok"],
                manifest_ids=manifest_ids,
            )
    rows = (
        ds.map_batches(stats_fn, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    sources: set[str] = set()
    samples: list[np.ndarray] = []
    for r in rows:
        sources.update(json.loads(r["srcs"]))
        samples.append(np.asarray(r["sample"], dtype=np.float64))
    sample = np.concatenate(samples) if samples else np.zeros(1)
    nq = 1 << _QUANTILE_BITS
    boundaries = np.unique(np.quantile(sample, np.linspace(0.0, 1.0, nq + 1)[1:-1]))
    return {
        "codes": {s: i for i, s in enumerate(sorted(sources))},
        "boundaries": boundaries,
    }


def _plan_groups(fragments, group_bytes: int | None):
    """Split the fragment list into byte-bounded groups, each clustered
    independently. Fragments are ordered by their zone-map min doc_id
    so groups inherit whatever key locality already exists. One group
    (group_bytes=None) = one global sort."""
    if group_bytes is None:
        return [list(fragments)] if fragments else []
    frags = sorted(
        fragments, key=lambda f: (str(f.zone_map.get("doc_id", {}).get("min") or ""), f.path)
    )
    groups, cur, cur_b = [], [], 0
    for f in frags:
        if cur and cur_b + f.bytes > group_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(f)
        cur_b += f.bytes
    if cur:
        groups.append(cur)
    return groups


def _sort_and_write(
    table: Table, group: list, enc_ref, curve: str, prefix: str,
    schema_info: tuple | None = None, cpu_limit: int | None = None,
    manifest_ids: dict | None = None,
) -> list:
    """One bounded cluster job: read → key (actor pool) → sort → write
    one fragment per sorted output block (a contiguous curve-key range
    → tight zone map). ``cpu_limit`` caps the streaming executor's CPU
    budget for this pipeline — the sort's read-key-sort-encode phases
    are memory-bus-bound copies that ANTI-scale past bus saturation
    (measured 23.8s@8 -> 57.5s@32 workers on one socket,
    SCALING_r03.json); see ops/_fanout.py."""
    from fupi_ray.ops import _fanout
    from fupi_ray.state import fs as _fs

    cfg = table.config
    # manifest stats, no footer reads; live_rows excludes DV'd rows
    total_bytes = sum(f.bytes for f in group)
    total_rows = sum(f.live_rows for f in group)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # parallelism floor is useless once blocks drop under ~8 MiB — the
    # per-partition sort/exchange overhead then outweighs the extra
    # cores (measured: 64 partitions of 2.5 MiB sort 3x slower than 16)
    nb_parallel = min(2 * cpus, max(1, total_bytes // (8 * 1024 * 1024)))
    nb = max(-(-total_bytes // max(cfg.target_fragment_bytes, 1)), nb_parallel)
    nb = max(1, min(int(nb), max(total_rows, 1)))

    # datasource construction is serialized: concurrent group threads
    # racing through ray's fsspec-http probe hit a partial-module
    # ImportError when aiohttp is absent (failed imports aren't cached,
    # so every thread retries the import simultaneously)
    with _READ_LOCK:
        from fupi_ray.ops import dv as _dvmod

        # DV-aware: deleted rows never enter the sort; their fragments
        # come out rewritten (clustering materializes deletion vectors)
        # rename-aware: renamed columns come out under their declared
        # names, so keying/normalization below see the current schema
        ds = _dvmod.fragments_dataset(
            table.table_dir, group, override_num_blocks=int(nb),
            manifest_ids=manifest_ids,
        )
    if cpu_limit is not None:
        ds = _fanout.limit_dataset_cpu(ds, cpu_limit)
    if schema_info is not None:
        # schema evolution: groups can mix pre/post-evolution files —
        # normalize every batch to the declared schema before keying
        from fupi_ray import manifest as mfm
        from fupi_ray.schema import normalize_batch

        names, types, defaults = schema_info
        try:
            declared = pa.schema(
                [(n, mfm.type_from_str(t)) for n, t in zip(names, types)]
            )
            fill = {n: (defaults or {}).get(n) for n in names if n != "doc_id"}
            ds = ds.map_batches(
                lambda b: normalize_batch(b, declared, fill, drop_extra=True),
                batch_format="pyarrow",
            )
        except ValueError:
            pass
    keyed = ds.map_batches(
        KeyInterleaver,
        fn_constructor_args=(enc_ref, curve, cfg.cluster_bits),
        batch_format="pyarrow",
        concurrency=(1, max(8, cpus)),
        zero_copy_batch=True,
    )
    clustered = keyed.sort("_ckey").map_batches(
        lambda t: t.drop_columns(["_ckey"]), batch_format="pyarrow"
    )
    # Output fragment size must be a function of DATA size, not sort
    # parallelism: the sort emits ~nb blocks, so writing one fragment
    # per block would fragment the layout 2-4x at high CPU counts
    # (measured: 74 vs 37 fragments for the same 9.6M rows at 32 vs 8
    # CPUs, and the post-cluster pruned scan paid 2x the per-fragment
    # overhead). Rebatch the sorted stream to target_fragment_bytes —
    # consecutive sorted rows coalesce, so zone maps stay tight.
    rows_per_frag = None
    if total_bytes > 0 and total_rows > 0:
        rows_per_frag = max(
            1, int(total_rows * cfg.target_fragment_bytes / total_bytes)
        )
    return write_dataset_fragments(
        clustered,
        table.table_dir,
        prefix,
        target_fragment_rows=rows_per_frag,
        bloom_bits=cfg.bloom_bits_per_key,
        row_group_rows=cfg.row_group_rows,
    )


def cluster(
    table: Table,
    curve: str = "zorder",
    version: int | None = None,
    job_id: str | None = None,
    group_bytes: int | str | None = "auto",
    incremental: bool = False,
) -> int:
    """Rewrite the table clustered by the interleaved key; new version.

    Content-preserving: only physical order and fragment boundaries
    change. ``group_bytes`` (default from config) bounds each sort:
    fragment groups of that size are clustered independently, one
    lineage record per group — a resumed job (same ``job_id``) skips
    completed groups, and no exchange ever spans more than one group
    (at 10^12-sequence scale a single global sort would be one 100 TB
    all-to-all; grouped clustering is how OPTIMIZE/Z-order works in
    production lakehouses). The default ``"auto"`` resolves through
    ``EngineConfig``: groups of ``cluster_auto_group_bytes`` (64 GiB),
    which still compiles a smaller-than-one-group table to a single
    global sort. Pass ``group_bytes=None`` (or set the config field to
    None) to force the single global sort — strict total curve order —
    at any size.

    ``incremental=True`` re-sorts ONLY fragments not already carrying
    this layout's ``cluster_sig`` tag ("curve@bits") — the appended /
    rewritten delta since the last cluster run. Already-clustered
    fragments keep their files, zone maps and curve order untouched
    (pruning quality per fragment depends only on its own key
    hyper-rectangle, never on cross-fragment order, so sorting the
    delta independently preserves it). A fully-clustered table is a
    no-op returning the current version with no commit. This is the
    scale path for clustered-table upkeep: a full recluster of a
    10^12-sequence table after every append is a full-table rewrite;
    the incremental run is O(delta).
    """
    import time

    from fupi_ray.state import fs as _lfs
    from fupi_ray.state import lineage

    if _lfs.is_process_local(table.table_dir):
        raise ValueError(
            "cluster reads/writes fragments from Ray worker processes; "
            "memory:// is process-local — use a shared protocol "
            "(local path, file://, s3://)"
        )
    cfg = table.config
    parent = table.latest_version() if version is None else version
    m = table.manifest(parent)
    sig = f"{curve}@{cfg.cluster_bits}"
    targets = (
        [f for f in m.fragments if f.cluster_sig != sig]
        if incremental
        else list(m.fragments)
    )
    if incremental and not targets:
        return parent  # fully clustered under this layout: no-op
    job_id = job_id or (
        f"cluster-inc-{curve}-v{parent}" if incremental else f"cluster-{curve}-v{parent}"
    )
    phase_t: dict[str, float] = {}
    t_last = time.perf_counter()

    def mark(phase: str) -> None:
        nonlocal t_last
        now = time.perf_counter()
        phase_t[phase] = round(now - t_last, 3)
        t_last = now

    # delta-only stats pass when every target fragment physically
    # carries both key columns (after renames); pre-evolution stragglers
    # fall back to the schema-padding full scan
    stats_frags: list | None = targets if incremental else None
    if stats_frags is not None:
        for f in stats_frags:
            if f.cols is None:
                continue
            rmap = f.rename_map(m.column_ids) if m.column_ids else {}
            inv = {d: p for p, d in rmap.items()}
            if not {inv.get("source", "source"), inv.get("n_tok", "n_tok")} <= set(
                f.cols
            ):
                stats_frags = None
                break
    enc_ref = ray.put(
        _column_stats(table, parent, frags=stats_frags, manifest_ids=m.column_ids)
    )
    mark("stats")

    if group_bytes == "auto":
        group_bytes = cfg.cluster_group_bytes
    if group_bytes == "auto":
        group_bytes = cfg.cluster_auto_group_bytes
    groups = _plan_groups(targets, group_bytes)

    from concurrent.futures import ThreadPoolExecutor

    from fupi_ray.ops import _fanout

    def run_group(gi: int, group) -> list:
        partition = f"group-{gi:05d}"
        # input identity includes the DV: the same file with a newer
        # deletion vector is a DIFFERENT logical input — a stale record
        # would resurrect deleted rows on resume
        inputs = [
            f.path + (f"@{f.dv_path}" if f.dv_path else "") for f in group
        ]
        rec = lineage.read_record(table.table_dir, job_id, partition)
        # reuse only when the record covers the SAME inputs — after an
        # intervening commit, group index gi can map to different files
        if rec is not None and rec.get("input_fragments") == inputs:
            return lineage.output_fragments(rec)
        t0 = time.perf_counter()
        # normalize only when the group's files disagree with the
        # declared schema (zero overhead on the homogeneous fast path)
        schema_info = None
        if m.schema_names and any(
            (
                f.cols is not None and set(f.cols) != set(m.schema_names)
            )
            or f.col_types  # pre-widen fragment: normalize casts it wide
            for f in group
        ):
            schema_info = (m.schema_names, m.schema_types, m.column_defaults)
        out = _sort_and_write(
            table, group, enc_ref, curve, f"cl-{job_id}-g{gi:04d}", schema_info,
            cpu_limit=group_cpu_limit, manifest_ids=m.column_ids,
        )
        lineage.write_record(
            table.table_dir,
            job_id,
            partition,
            input_fragments=inputs,
            output_fragments=out,
            metrics={"seconds": time.perf_counter() - t0, "rows": sum(f.rows for f in out)},
        )
        return out

    # overlap group sort jobs (each is an independent bounded Dataset
    # pipeline): wall time ≈ max(group) not sum(groups). Output order
    # stays deterministic — results are collected in group order.
    workers = max(1, min(cfg.cluster_group_concurrency, len(groups)))
    # the pure-copy cap is CLUSTER-wide: concurrent group pipelines
    # split it so the sum of their executors never exceeds the bus
    # saturation point (see ops/_fanout.py)
    group_cpu_limit = max(
        1, _fanout.copy_concurrency_cap(cfg.memcpy_max_concurrency) // workers
    )
    if workers == 1:
        results = [run_group(gi, g) for gi, g in enumerate(groups)]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(run_group, range(len(groups)), groups))
    frags = [f for out in results for f in out]
    for f in frags:
        f.cluster_sig = sig  # curve-ordered as written: tag for incremental runs
    mark("sort_write")

    old_paths = {f.path for f in targets}
    return table.commit_fragment_swap(
        old_paths,
        frags,
        operation=f"cluster-{curve}" + ("-incremental" if incremental else ""),
        expected_parent=parent,
        properties={
            "curve": curve,
            "bits": cfg.cluster_bits,
            "sources": len(ray.get(enc_ref)["codes"]),
            "groups": len(groups),
            "incremental": bool(incremental),
            "fragments_in": len(targets),
            "fragments_kept": len(m.fragments) - len(targets),
            "phase_seconds": phase_t,
        },
    )
