"""Training-shard export: deterministic hash assignment, per-shard
manifest accounting, round-trip content equality incl. token arrays,
and stability of assignment under physical rewrites (compaction)."""

import os

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import generate_rows, write_fragmented_table
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.ops import compact, export_training_shards, read_export_manifest

CFG = EngineConfig(target_fragment_bytes=256 * 1024)
N = 4


def _full_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["tokens"] = df["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    return df.sort_values("doc_id").reset_index(drop=True)


def test_export_round_trip_and_manifest(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 800, rows_per_fragment=100, config=CFG)
    out = str(tmp_path / "shards")
    man = export_training_shards(t, out, N)
    assert man["total_rows"] == 800
    assert sum(s["rows"] for s in man["shards"]) == 800
    # manifest written and readable
    man2 = read_export_manifest(out)
    assert man2["num_shards"] == N and man2["version"] == t.latest_version()

    # content round-trip incl. token arrays
    back = _full_df(ray.data.read_parquet(out))
    want = _full_df(t.scan())
    pd.testing.assert_frame_equal(back[want.columns], want)

    # every row is in the shard its doc_id hashes to
    for s in man["shards"]:
        for rel in s["files"]:
            assert rel.startswith(f"shard={s['shard']:05d}/")
        df = ray.data.read_parquet(os.path.join(out, f"shard={s['shard']:05d}")).to_pandas() if s["rows"] else None
        if df is not None:
            h = stable_hash(df["doc_id"].to_numpy(dtype=object)) % np.uint64(N)
            assert (h == s["shard"]).all()


def test_export_assignment_stable_under_compaction(tmp_path):
    """Shard membership depends only on doc_id — compacting the table
    between two exports must not move any row between shards."""
    t = write_fragmented_table(str(tmp_path / "t"), 600, rows_per_fragment=60, config=CFG)
    out1 = str(tmp_path / "e1")
    man1 = export_training_shards(t, out1, N)
    compact(t)
    out2 = str(tmp_path / "e2")
    man2 = export_training_shards(t, out2, N)
    assert [s["rows"] for s in man1["shards"]] == [s["rows"] for s in man2["shards"]]
    for s in range(N):
        a = set(
            ray.data.read_parquet(os.path.join(out1, f"shard={s:05d}"))
            .select_columns(["doc_id"]).to_pandas()["doc_id"]
        )
        b = set(
            ray.data.read_parquet(os.path.join(out2, f"shard={s:05d}"))
            .select_columns(["doc_id"]).to_pandas()["doc_id"]
        )
        assert a == b


def test_export_custom_assign_and_balance(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 400, rows_per_fragment=100, config=CFG)
    out = str(tmp_path / "shards")

    import pyarrow as pa
    import pyarrow.compute as pc

    def by_suffix(ids):
        return pc.cast(pc.utf8_slice_codeunits(ids, 4, 99), pa.int64()).to_numpy(
            zero_copy_only=False
        )

    man = export_training_shards(t, out, N, assign=by_suffix)
    assert [s["rows"] for s in man["shards"]] == [100] * N  # round-robin exact


def test_export_refuses_nonempty_dir_and_overwrite_clears(tmp_path):
    """Re-exporting into a used directory would leave the old run's
    parts for directory-glob readers to double-count (review finding):
    refused by default, clean-slate with overwrite=True."""
    t = write_fragmented_table(str(tmp_path / "t"), 200, rows_per_fragment=100, config=CFG)
    out = str(tmp_path / "shards")
    export_training_shards(t, out, N)
    with pytest.raises(ValueError, match="not empty"):
        export_training_shards(t, out, N)
    man = export_training_shards(t, out, N, overwrite=True)
    assert man["total_rows"] == 200
    assert ray.data.read_parquet(out).count() == 200  # no duplicates


def test_export_requires_doc_id_column(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    with pytest.raises(ValueError, match="doc_id"):
        export_training_shards(t, str(tmp_path / "x"), N, columns=["tokens"])


def test_export_rejects_bad_shard_count(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    with pytest.raises(ValueError):
        export_training_shards(t, str(tmp_path / "x"), 0)


def test_concurrent_exports_one_winner(tmp_path):
    """Two exports racing into ONE directory (VERDICT r4 #3): exactly
    one run wins; the loser fails on the exclusive _EXPORT_LOCK (or on
    the non-empty check if the winner already finished) instead of
    interleaving part files, and the surviving directory is a complete
    single-run export."""
    import threading

    t = write_fragmented_table(str(tmp_path / "t"), 600, rows_per_fragment=100, config=CFG)
    out = str(tmp_path / "shards")
    results: dict[int, object] = {}
    barrier = threading.Barrier(2)

    def run(i: int):
        barrier.wait()
        try:
            results[i] = export_training_shards(t, out, N)
        except ValueError as e:
            results[i] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    oks = [r for r in results.values() if isinstance(r, dict)]
    errs = [r for r in results.values() if isinstance(r, ValueError)]
    assert len(oks) == 1 and len(errs) == 1, results
    man = read_export_manifest(out)
    assert man["total_rows"] == 600
    # the surviving parts are exactly the winner's manifest files
    on_disk = {
        os.path.join(d, f)
        for d in os.listdir(out)
        if d.startswith("shard=")
        for f in os.listdir(os.path.join(out, d))
        if f.endswith(".parquet")
    }
    in_manifest = {rel for s in man["shards"] for rel in s["files"]}
    assert on_disk == in_manifest
    assert ray.data.read_parquet(out).count() == 600


def test_crashed_export_lock_requires_overwrite(tmp_path):
    """A crashed export leaves the lock + partial parts; the next run
    must refuse without overwrite=True and succeed with it."""
    from fupi_ray.ops.export import _LOCK_NAME

    t = write_fragmented_table(str(tmp_path / "t"), 200, rows_per_fragment=100, config=CFG)
    out = str(tmp_path / "shards")
    os.makedirs(out)
    with open(os.path.join(out, _LOCK_NAME), "w") as fh:
        fh.write("crashed-run-token")
    with pytest.raises(ValueError, match="overwrite=True"):
        export_training_shards(t, out, N)
    man = export_training_shards(t, out, N, overwrite=True)
    assert man["total_rows"] == 200
    assert not os.path.exists(os.path.join(out, _LOCK_NAME))
