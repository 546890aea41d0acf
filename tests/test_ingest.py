"""ingest_files: exactly-once file-level ingestion (ops/ingest.py).

Covers: skip-on-rerun idempotency, incremental new-file pickup, changed
-file semantics under both identity modes, jsonl sources, concurrent
racers never double-loading a file, checkpoint survival across snapshot
expiry, and GC of superseded ledger metadata.
"""

import json
import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fupi_ray.ops import expire_snapshots, ingest_files
from fupi_ray.ops.ingest import current_ledger
from fupi_ray.table import Table


def _write_parquet(path, lo, hi):
    pq.write_table(
        pa.table({"doc_id": list(range(lo, hi)), "n_tok": [7] * (hi - lo)}), path
    )
    return str(path)


def _rows(t: Table) -> int:
    return t.scan().count()


def test_ingest_then_rerun_is_noop(tmp_path, tmp_table_dir):
    files = [_write_parquet(tmp_path / f"f{i}.parquet", i * 10, i * 10 + 10) for i in range(3)]
    t = Table.create(tmp_table_dir)
    r1 = ingest_files(t, files)
    assert r1["files_ingested"] == 3 and r1["rows_ingested"] == 30
    assert _rows(t) == 30
    r2 = ingest_files(t, files)
    assert r2["files_ingested"] == 0 and r2["files_skipped"] == 3
    assert r2["version"] == r1["version"]  # no empty commit
    assert _rows(t) == 30


def test_ingest_picks_up_only_new_files(tmp_path, tmp_table_dir):
    a = _write_parquet(tmp_path / "a.parquet", 0, 10)
    t = Table.create(tmp_table_dir)
    ingest_files(t, [a])
    b = _write_parquet(tmp_path / "b.parquet", 10, 15)
    r = ingest_files(t, [a, b])
    assert r["files_ingested"] == 1 and r["files_skipped"] == 1
    assert _rows(t) == 15
    got = sorted(r["doc_id"] for r in t.scan(columns=["doc_id"]).take_all())
    assert got == list(range(15))


def test_ingest_directory_expansion(tmp_path, tmp_table_dir):
    d = tmp_path / "landing"
    d.mkdir()
    _write_parquet(d / "x.parquet", 0, 5)
    _write_parquet(d / "y.parquet", 5, 9)
    # hidden/underscore names (manifests, locks) must not be ingested
    (d / "_MANIFEST.json").write_text("{}")
    t = Table.create(tmp_table_dir)
    r = ingest_files(t, str(d))
    assert r["files_ingested"] == 2 and _rows(t) == 9


def test_changed_file_stat_vs_path_identity(tmp_path, tmp_table_dir):
    f = _write_parquet(tmp_path / "f.parquet", 0, 10)
    t = Table.create(tmp_table_dir)
    ingest_files(t, [f])
    # rewrite with different contents (and force a distinct mtime)
    _write_parquet(tmp_path / "f.parquet", 100, 105)
    os.utime(f, (1_700_000_000, 1_700_000_000))
    r_path = ingest_files(t, [f], identity="path")
    assert r_path["files_ingested"] == 0  # path mode: seen path, skip
    r_stat = ingest_files(t, [f], identity="stat")
    assert r_stat["files_ingested"] == 1  # stat mode: new identity
    assert _rows(t) == 15


def test_ingest_jsonl(tmp_path, tmp_table_dir):
    p = tmp_path / "rows.jsonl"
    with open(p, "w") as f:
        for i in range(8):
            f.write(json.dumps({"doc_id": i, "n_tok": 3}) + "\n")
    t = Table.create(tmp_table_dir)
    r = ingest_files(t, [str(p)], format="jsonl")
    assert r["rows_ingested"] == 8 and _rows(t) == 8
    assert ingest_files(t, [str(p)], format="jsonl")["files_ingested"] == 0


def test_concurrent_racers_never_double_load(tmp_path, tmp_table_dir):
    files = [_write_parquet(tmp_path / f"f{i}.parquet", i * 10, i * 10 + 10) for i in range(4)]
    Table.create(tmp_table_dir)
    results, errors = [], []

    def racer():
        try:
            # each thread gets its own handle (no shared Table state)
            results.append(ingest_files(Table.open(tmp_table_dir), files))
        except Exception:  # pragma: no cover - diagnostic
            import traceback

            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=racer) for _ in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t = Table.open(tmp_table_dir)
    assert _rows(t) == 40  # every file loaded exactly once, overall
    assert sum(r["files_ingested"] for r in results) == 4
    got = sorted(r["doc_id"] for r in t.scan(columns=["doc_id"]).take_all())
    assert got == list(range(40))
    # race losers must clean up their abandoned-attempt fragments
    live = {f.path.split("/", 1)[1] for f in t.manifest().fragments}
    data = [
        n
        for n in os.listdir(os.path.join(tmp_table_dir, "data"))
        if n.endswith(".parquet")
    ]
    assert not [n for n in data if n not in live], "orphaned loser fragments"


def test_ledger_survives_expiry(tmp_path, tmp_table_dir):
    f = _write_parquet(tmp_path / "f.parquet", 0, 10)
    t = Table.create(tmp_table_dir)
    ingest_files(t, [f])
    # bury the ingest commit under unrelated appends, then expire it
    import ray.data

    for i in range(3):
        t.commit_append(
            ray.data.from_arrow(
                pa.table({"doc_id": [1000 + i], "n_tok": [1]})
            )
        )
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0)
    assert len(t.versions()) <= 2
    # the checkpoint file outlives the expired header: still skipped
    r = ingest_files(t, [f])
    assert r["files_ingested"] == 0 and r["files_skipped"] == 1


def test_expiry_gcs_superseded_ingest_metadata(tmp_path, tmp_table_dir):
    t = Table.create(tmp_table_dir)
    for i in range(4):
        f = _write_parquet(tmp_path / f"f{i}.parquet", i * 10, i * 10 + 10)
        ingest_files(t, [f])
    idir = os.path.join(tmp_table_dir, "manifest", "ingest")
    before = sorted(os.listdir(idir))
    assert sum(n.startswith("ledger-") for n in before) == 4
    rep = expire_snapshots(t, keep_last=100, gc_grace_seconds=0)
    assert rep["gc_ingest_files"] >= 2  # superseded checkpoints dropped
    after = sorted(os.listdir(idir))
    # newest checkpoints and all still-referenced batch sidecars remain
    assert sum(n.startswith("ledger-") for n in after) == 2
    assert sum(n.startswith("batch-") for n in after) == 4
    # idempotency intact after GC
    assert ingest_files(t, [str(tmp_path / "f0.parquet")])["files_ingested"] == 0


def test_current_ledger_tracks_identities(tmp_path, tmp_table_dir):
    a = _write_parquet(tmp_path / "a.parquet", 0, 5)
    t = Table.create(tmp_table_dir)
    assert current_ledger(t) == set()
    ingest_files(t, [a])
    led = current_ledger(t)
    assert len(led) == 1 and next(iter(led)).startswith(a)


def test_ingest_bad_format_and_empty_input(tmp_path, tmp_table_dir):
    t = Table.create(tmp_table_dir)
    with pytest.raises(ValueError, match="format"):
        ingest_files(t, [_write_parquet(tmp_path / "f.parquet", 0, 2)], format="csvx")
    r = ingest_files(t, [])
    assert r["files_ingested"] == 0 and r["files_skipped"] == 0


def test_duplicate_inputs_load_once(tmp_path, tmp_table_dir):
    d = tmp_path / "landing"
    d.mkdir()
    a = _write_parquet(d / "a.parquet", 0, 10)
    t = Table.create(tmp_table_dir)
    # directory plus an explicit member: one copy, not two
    r = ingest_files(t, [str(d), a, a])
    assert r["files_ingested"] == 1 and _rows(t) == 10


def test_newline_path_rejected(tmp_path, tmp_table_dir):
    t = Table.create(tmp_table_dir)
    with pytest.raises(ValueError, match="newline"):
        ingest_files(t, ["/tmp/bad\nname.parquet"])


def test_force_reloads_after_rollback(tmp_path, tmp_table_dir):
    from fupi_ray.ops import rollback

    f = _write_parquet(tmp_path / "f.parquet", 0, 10)
    t = Table.create(tmp_table_dir)
    v0 = t.latest_version()
    ingest_files(t, [f])
    rollback(t, v0)
    assert _rows(t) == 0
    # plain re-offer stays skipped (table-lifetime ledger, documented)
    assert ingest_files(t, [f])["files_ingested"] == 0
    # force is the recovery path
    r = ingest_files(t, [f], force=True)
    assert r["files_ingested"] == 1 and _rows(t) == 10
    # and a later plain run is a no-op again
    assert ingest_files(t, [f])["files_ingested"] == 0


def test_ingest_csv(tmp_path, tmp_table_dir):
    p = tmp_path / "rows.csv"
    p.write_text("doc_id,n_tok\n" + "\n".join(f"{i},3" for i in range(6)) + "\n")
    t = Table.create(tmp_table_dir)
    r = ingest_files(t, [str(p)], format="csv")
    assert r["rows_ingested"] == 6 and _rows(t) == 6
    assert ingest_files(t, [str(p)], format="csv")["files_ingested"] == 0


def test_ingest_uri_landing(tmp_path, tmp_table_dir):
    """S8: the landing zone addressed through a scheme:// URI — the
    ledger identity layer (ls/stat over fsspec) and the read plan must
    both resolve the protocol."""
    d = tmp_path / "landing"
    d.mkdir()
    _write_parquet(d / "a.parquet", 0, 10)
    _write_parquet(d / "b.parquet", 10, 14)
    t = Table.create(tmp_table_dir)
    uri = f"file://{d}"
    r = ingest_files(t, uri)
    assert r["files_ingested"] == 2 and _rows(t) == 14
    assert ingest_files(t, uri)["files_ingested"] == 0
    # identities recorded under the URI form: a plain-path re-offer of
    # the same files is a DIFFERENT identity (documented: the path
    # string is part of the identity), so dedup is per-addressing-form
    led = current_ledger(t)
    assert all(e.startswith("file://") for e in led)


def test_mixed_plain_and_uri_batch(tmp_path, tmp_table_dir):
    a = _write_parquet(tmp_path / "a.parquet", 0, 10)
    b = _write_parquet(tmp_path / "b.parquet", 10, 14)
    t = Table.create(tmp_table_dir)
    # one plan per protocol: plain + file:// in one batch must load both
    r = ingest_files(t, [a, f"file://{b}"])
    assert r["files_ingested"] == 2 and _rows(t) == 14


def test_memory_uri_landing_rejected(tmp_table_dir):
    t = Table.create(tmp_table_dir)
    with pytest.raises(ValueError, match="process-local"):
        ingest_files(t, ["memory://landing/a.parquet"])
