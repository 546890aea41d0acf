"""End-to-end `ray job submit` entry-point test: drives the full
maintenance cycle through `python -m fupi_ray.cli` subprocesses — the
exact surface the north rule's job submission uses. Each invocation
owns its own Ray session (the library never calls ray.init; the CLI
does), so this runs OUTSIDE the session-scoped pytest Ray fixture.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def run_cli(*args: str) -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # CLI owns its session
    out = subprocess.run(
        [sys.executable, "-m", "fupi_ray.cli", *args, "--num-cpus", "4"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_full_cycle(tmp_path):
    table = str(tmp_path / "tbl")

    r = run_cli("ingest", "--table", table, "--rows", "3000", "--rows-per-fragment", "500")
    assert r["version"] == 1

    r = run_cli("scan", "--table", table)
    assert r["rows"] == 3000

    r = run_cli("compact", "--table", table)
    assert r["version"] == 2

    r = run_cli("cluster", "--table", table, "--curve", "zorder")
    assert r["version"] == 3

    # MERGE from a parquet source file (updates 100 existing + 50 new)
    from fupi_ray.fixtures import generate_rows

    src = pa.concat_tables(
        [generate_rows(0, 100, token_salt=9), generate_rows(1_000_000, 50)]
    )
    src_path = str(tmp_path / "src.parquet")
    pq.write_table(src, src_path)
    r = run_cli("merge", "--table", table, "--source", src_path)
    assert r["version"] == 4

    r = run_cli("scan", "--table", table)
    assert r["rows"] == 3050

    r = run_cli("expire", "--table", table, "--keep-last", "1")
    assert r["expired_versions"]

    # old pinned-style version gone, latest still scans
    r = run_cli("scan", "--table", table)
    assert r["rows"] == 3050


def test_cli_mutation_cycle(tmp_path):
    table = str(tmp_path / "tbl")
    run_cli("ingest", "--table", table, "--rows", "2000", "--rows-per-fragment", "500")

    r = run_cli("delete", "--table", table, "--where", "n_tok:between:100..300")
    assert r["version"] == 2 and r["rows_deleted"] > 0
    n_deleted = r["rows_deleted"]

    r = run_cli(
        "update", "--table", table, "--where", "source:==:wiki", "--set", "source=curated"
    )
    assert r["version"] == 3

    r = run_cli("changelog", "--table", table, "--from-version", "1")
    # inserts = updated rows (new content); deletes = updated-old + deleted
    assert r["inserts"] > 0
    assert r["deletes"] == r["inserts"] + n_deleted

    r = run_cli("rollback", "--table", table, "--to-version", "1")
    assert r["version"] == 4

    r = run_cli("scan", "--table", table)
    assert r["rows"] == 2000

    r = run_cli("scan", "--table", table, "--where", "n_tok:<=:50")
    assert 0 < r["rows"] < 2000


def test_cli_replicate(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    run_cli("ingest", "--table", src, "--rows", "1500", "--rows-per-fragment", "500")
    run_cli("ingest", "--table", dst, "--rows", "1500", "--rows-per-fragment", "300")

    run_cli("delete", "--table", src, "--where", "n_tok:between:100..300")
    r = run_cli("replicate", "--table", src, "--replica", dst, "--from-version", "1")
    assert r["cdc_keys"] > 0 and r["cdc_inserts"] == 0
    v = r["version"]

    s = run_cli("scan", "--table", src)
    d = run_cli("scan", "--table", dst)
    assert s["rows"] == d["rows"]

    # exactly-once: re-running the job returns the same version
    r = run_cli("replicate", "--table", src, "--replica", dst, "--from-version", "1")
    assert r["version"] == v


def test_cli_dv_and_matview(tmp_path):
    table = str(tmp_path / "tbl")
    view = str(tmp_path / "view")
    run_cli("ingest", "--table", table, "--rows", "2000", "--rows-per-fragment", "500")

    r = run_cli(
        "matview", "--table", table, "--view", view,
        "--group-col", "source", "--agg", "n=count", "--agg", "tok=sum:n_tok",
    )
    assert r["groups"] > 0 and r["watermark"] == 1

    before = run_cli("scan", "--table", table)["rows"]
    r = run_cli(
        "delete", "--table", table, "--where", "n_tok:between:100..300", "--mode", "dv"
    )
    assert r["rows_deleted"] > 0 and r["fragments_dv"] > 0
    after = run_cli("scan", "--table", table)["rows"]
    assert after == before - r["rows_deleted"]

    r = run_cli("refresh-view", "--table", table, "--view", view)
    assert r["watermark"] == 2 and r["affected_groups"] > 0 and r["rescan"] is False

    r = run_cli(
        "update", "--table", table, "--where", "source:==:wiki",
        "--set", "source=curated", "--mode", "dv",
    )
    assert run_cli("scan", "--table", table, "--where", "source:==:wiki")["rows"] == 0


def test_cli_fork_cycle(tmp_path):
    src = str(tmp_path / "src")
    dev = str(tmp_path / "dev")
    run_cli("ingest", "--table", src, "--rows", "1500", "--rows-per-fragment", "500")

    r = run_cli("fork", "--table", src, "--fork-dir", dev, "--name", "dev")
    assert r["fork_of"] == src and r["pin"] == "fork-dev"
    assert run_cli("scan", "--table", dev)["rows"] == 1500

    run_cli("delete", "--table", dev, "--where", "n_tok:<:100", "--mode", "dv")
    assert run_cli("scan", "--table", src)["rows"] == 1500  # isolation

    r = run_cli("replicate", "--table", dev, "--replica", src, "--from-version", "1")
    assert run_cli("scan", "--table", src)["rows"] == run_cli("scan", "--table", dev)["rows"]

    run_cli("drop-fork", "--table", src, "--fork-dir", dev)


def test_cli_insert_missing_and_dedup_docs(tmp_path):
    from fupi_ray.fixtures import generate_rows

    table = str(tmp_path / "tbl")
    run_cli("ingest", "--table", table, "--rows", "2000", "--rows-per-fragment", "500")

    # feed re-offers 300 existing keys (changed payload) + 100 new ones
    src = pa.concat_tables(
        [generate_rows(0, 300, token_salt=9), generate_rows(1_000_000, 100)]
    )
    src_path = str(tmp_path / "feed.parquet")
    pq.write_table(src, src_path)
    r = run_cli("insert-missing", "--table", table, "--source", src_path)
    assert r["rows_inserted"] == 100 and r["rows_skipped"] == 300
    # replay is a no-op
    r = run_cli("insert-missing", "--table", table, "--source", src_path)
    assert r["rows_inserted"] == 0

    # plant exact duplicates: re-insert 50 rows under NEW doc_ids with
    # the same token content as rows 0..49 (token content is a pure
    # function of (id, salt), so copy tokens from the originals)
    orig = generate_rows(0, 50)
    dup = orig.set_column(
        orig.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([f"dup-{i:06d}" for i in range(50)], pa.string()),
    )
    dup_path = str(tmp_path / "dups.parquet")
    pq.write_table(dup, dup_path)
    run_cli("insert-missing", "--table", table, "--source", dup_path)
    r = run_cli("dedup-docs", "--table", table, "--threshold", "0.8", "--mode", "dv")
    assert r["rows_deleted"] == 50 and r["families"] == 50
    r = run_cli("scan", "--table", table)
    assert r["rows"] == 2100


def test_cli_pack_rerun_refused(tmp_path):
    """`pack` into a used --output must refuse (a rerun would mix
    stale parts in and inflate packed_rows) and the reported count
    must come from THIS run's files only (VERDICT r4 #3)."""
    table = str(tmp_path / "tbl")
    out_dir = str(tmp_path / "packed")
    run_cli("ingest", "--table", table, "--rows", "2000", "--rows-per-fragment", "500")
    r = run_cli("pack", "--table", table, "--output", out_dir, "--context-len", "256")
    assert r["packed_rows"] > 0
    n_files = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    assert n_files > 0
    # the reported count equals the rows in this run's parquet footers
    total = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    assert r["packed_rows"] == total

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    rerun = subprocess.run(
        [sys.executable, "-m", "fupi_ray.cli", "pack", "--table", table,
         "--output", out_dir, "--context-len", "256", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert rerun.returncode != 0
    assert "not empty" in rerun.stderr
    # the refused rerun must not have touched the first run's output
    assert len([f for f in os.listdir(out_dir) if f.endswith(".parquet")]) == n_files
