"""Per-stage Ray Data stats audit: prints ``ds.stats()`` for the
headline pipelines so operator fusion and stage wall-time splits are
inspectable (is the read fused with its consumer? which stage owns the
wall time? is anything spilling?).

Usage: python tools/perf_audit.py [sf_dir] [rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa

    from fupi_ray import EngineConfig, Table
    from fupi_ray.fixtures import sequences_dataset

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    root = "/dev/shm/fupi_audit" if os.path.isdir("/dev/shm") else "/tmp/fupi_audit"
    shutil.rmtree(root, ignore_errors=True)
    t = Table.create(root, config=EngineConfig(target_fragment_bytes=64 * 1024 * 1024))
    t.commit_append(sequences_dataset(rows, rows_per_partition=50_000))

    def show(name: str, ds) -> None:
        t0 = time.perf_counter()
        if hasattr(ds, "materialize"):
            out = ds.materialize()
        wall = time.perf_counter() - t0
        print(f"\n=== {name} ({wall:.2f}s) " + "=" * max(0, 50 - len(name)))
        print(out.stats())

    # headline scan: the read MUST be fused with the reducing map
    # (one task per fragment, no SplitBlocks between them)
    ds = t.scan()

    def reduce_batch(b: pa.Table) -> pa.Table:
        flat = b["tokens"].combine_chunks().flatten()
        s = int(np.sum(b["n_tok"].to_numpy(zero_copy_only=False), dtype=np.int64))
        ck = int(np.bitwise_xor.reduce(flat.to_numpy(zero_copy_only=False).view(np.uint32)))
        return pa.table({"s": [s], "ck": [ck]})

    show("headline scan+reduce", ds.map_batches(reduce_batch, batch_format="pyarrow", zero_copy_batch=True))

    from fupi_ray.pipelines import queries as q

    show("agg_pricing", q.q_agg_pricing(sf_dir))
    show("minhash candidates", __import__("fupi_ray.stages.dedup", fromlist=["d"]).minhash_lsh_candidates(
        q.read(sf_dir, "documents", columns=["doc_id", "text"])
    ))
    show("char_jaccard", q.q_char_jaccard(sf_dir))

    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
