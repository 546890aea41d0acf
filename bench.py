"""Benchmark harness.

Headline (the BASELINE.json metric): on a synthetic tokenized
sequences table (deterministic generator, small-file ingest state) —
ingest → compact → **post-compaction full-scan tokens/sec** → Z-order
cluster → **MERGE INTO wall-time**. Plus a set of representative
operator pipelines over $GRAFT_SF_DIR testdata.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "scan_tokens_per_sec": ..., "merge_sec": ...}

--scaling: runs the whole bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and =32 (the sandbox stand-in for N vs 4N nodes) and
reports per-CPU scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_rows = int(os.environ.get("GRAFT_BENCH_ROWS", "400000"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data

    from fupi_ray import EngineConfig, Table
    from fupi_ray.fixtures import sequences_dataset
    from fupi_ray.ops import cluster, compact, merge_into
    from fupi_ray.pipelines import queries as q

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # ---- headline: lakehouse maintenance cycle on sequences ---------------
    tdir = f"/tmp/fupi_bench/rows{bench_rows}-cpus{num_cpus}"
    shutil.rmtree(tdir, ignore_errors=True)
    cfg = EngineConfig(target_fragment_bytes=64 * 1024 * 1024)
    table = Table.create(tdir, config=cfg)

    # warm the generator + page cache once (untimed) per ray_guide guidance
    sequences_dataset(10_000, rows_per_partition=5_000).count()

    def ingest():
        ds = sequences_dataset(bench_rows, rows_per_partition=4_000)
        table.commit_append(ds)  # one fragment per 4k-row block → small-file state

    timed("ingest", ingest)
    timed("compact", lambda: compact(table))

    def full_scan() -> int:
        ds = table.scan(columns=["n_tok"])
        return int(
            ds.map_batches(
                lambda t: pa.table({"s": [int(np.sum(t["n_tok"].to_numpy(zero_copy_only=False), dtype=np.int64))]}),
                batch_format="pyarrow",
            ).sum("s")
        )

    total_tokens = timed("scan", full_scan)
    # scan again with full payload (tokens column) — the real byte-moving scan
    def full_scan_payload() -> int:
        ds = table.scan()
        return ds.count()

    timed("scan_payload", full_scan_payload)
    timed("cluster", lambda: cluster(table, curve="zorder"))

    def do_merge():
        n_upd = bench_rows // 10
        upd = sequences_dataset(n_upd, rows_per_partition=20_000, token_salt=5)
        ins = sequences_dataset(
            bench_rows // 20, rows_per_partition=20_000, start=bench_rows + 1_000_000
        )
        merge_into(table, upd.union(ins), strategy="auto")

    timed("merge", do_merge)

    # ---- operator pipelines over testdata ---------------------------------
    def consume(ds):
        import pandas as pd

        if isinstance(ds, ray.data.Dataset):
            for _ in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
                pass
        return ds

    for name, fn in [
        ("agg_pricing", q.q_agg_pricing),
        ("join_enrich", q.q_join_enrich),
        ("window_events", q.q_window_events),
        ("string_agg_events", q.q_string_agg_events),
        ("dedup_exact", q.q_dedup_exact),
        ("topk_cosine", q.q_topk_cosine),
        ("langid", q.q_langid),
        ("minhash_pairs", q.q_minhash_pairs),
    ]:
        timed(name, lambda fn=fn: consume(fn(sf_dir)))

    scan_tps = round(total_tokens / timings["scan"], 1)
    result = {
        "metric": "post-compaction full-scan throughput (tokens/sec) + MERGE INTO wall-time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "bench_rows": bench_rows,
        "total_tokens": total_tokens,
        "scan_tokens_per_sec": scan_tps,
        "merge_sec": timings["merge"],
    }
    ray.shutdown()
    shutil.rmtree(tdir, ignore_errors=True)
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    # headline work rate = total tokens scanned per second of core pipeline
    core = ["ingest", "compact", "scan", "scan_payload", "cluster", "merge"]
    t_lo = sum(lo["queries"][k] for k in core)
    t_hi = sum(hi["queries"][k] for k in core)
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling efficiency (N=8 vs 4N=32 cpus, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": round(t_lo, 3),
        "sec_32": round(t_hi, 3),
        "tokens_per_sec_8": lo["scan_tokens_per_sec"],
        "tokens_per_sec_32": hi["scan_tokens_per_sec"],
        "merge_sec_8": lo["merge_sec"],
        "merge_sec_32": hi["merge_sec"],
        "scaling_efficiency": round(eff, 3),
        "num_cpus": hi_cpus,
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
