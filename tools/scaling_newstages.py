"""One-leg-per-CPU-count scaling sanity for the round-4 final stages
(ingest_files / re-offer / tokindex build / keyword miss): run with
RAY_GRAFT_CPUS=8 and =32 in fresh processes on the SAME input size and
compare wall times. These stages must not anti-scale; the re-offer and
miss probes are metadata-bound and should be flat (≪1s) at any width.

Usage: RAY_GRAFT_CPUS=8 python tools/scaling_newstages.py
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("GRAFT_BENCH_ROWS", "2000000"))
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fupi_ray import EngineConfig, Table
    from fupi_ray.fixtures import sequences_dataset
    from fupi_ray.ops import ensure_token_blooms, ingest_files, keyword_lookup

    root = "/dev/shm/fupi_scale_new" if os.path.isdir("/dev/shm") else "/tmp/fupi_scale_new"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(target_fragment_bytes=64 * 1024 * 1024)

    timings: dict = {"num_cpus": num_cpus, "rows": rows}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    landing = f"{root}/landing"
    sequences_dataset(rows // 4, rows_per_partition=50_000).write_parquet(landing)
    t = Table.create(f"{root}/tbl", config=cfg)
    timed("ingest_files", lambda: ingest_files(t, landing))
    timed("ingest_files_reoffer", lambda: ingest_files(t, landing))

    big = Table.create(f"{root}/big", config=cfg)
    big.commit_append(sequences_dataset(rows, rows_per_partition=50_000))
    timed("tokindex_build", lambda: ensure_token_blooms(big))
    timed(
        "keyword_miss",
        lambda: keyword_lookup(big, [2_000_000_001], columns=["doc_id"]).count(),
    )

    print(json.dumps(timings))
    ray.shutdown()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
