"""insert_missing (ops/merge.py): MERGE WHEN NOT MATCHED INSERT — the
idempotent-ingest primitive. Matched keys must be skipped WITHOUT
touching their target rows (no rewrite), missing keys appended once,
and a stale snapshot pin must fail loudly instead of double-inserting."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.ops import insert_missing
from fupi_ray.table import Table


def _seq_table(ids, salt=0):
    toks = [list(range(salt + i, salt + i + 8)) for i in range(len(ids))]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "n_tok": pa.array([8] * len(ids), pa.int32()),
            "source": pa.array(["s"] * len(ids), pa.string()),
        }
    )


def _build(table_dir, n=40):
    ids = [f"doc-{i:06d}" for i in range(n)]
    t = Table.create(table_dir)
    t.commit_append(ray.data.from_arrow(_seq_table(ids)), target_fragment_rows=10)
    return t, ids


def test_insert_missing_skips_existing_keeps_target_rows(tmp_table_dir):
    t, ids = _build(tmp_table_dir)
    before = {r["doc_id"]: list(r["tokens"]) for r in t.scan().take_all()}
    # half overlap (with DIFFERENT payload — must be ignored), half new
    overlap = ids[::2]
    new = [f"new-{i:06d}" for i in range(15)]
    src = ray.data.from_arrow(_seq_table(overlap + new, salt=999))
    res = insert_missing(t, src)
    assert res["rows_inserted"] == len(new)
    assert res["rows_skipped"] == len(overlap)
    assert res["version"] == t.latest_version()
    after = {r["doc_id"]: list(r["tokens"]) for r in t.scan().take_all()}
    assert len(after) == len(ids) + len(new)
    for d in overlap:  # matched target rows byte-identical (no rewrite)
        assert after[d] == before[d], d
    for i, d in enumerate(new):  # inserted rows carry the SOURCE payload
        assert after[d] == list(range(999 + len(overlap) + i, 999 + len(overlap) + i + 8))


def test_insert_missing_idempotent(tmp_table_dir):
    t, ids = _build(tmp_table_dir, n=20)
    src = ray.data.from_arrow(_seq_table(ids[:5] + ["x-1", "x-2"], salt=7))
    r1 = insert_missing(t, src)
    assert r1["rows_inserted"] == 2
    v1 = t.latest_version()
    r2 = insert_missing(t, src)  # crash-retry replay: nothing new
    assert r2 == {"version": v1, "rows_inserted": 0, "rows_skipped": 7}
    assert t.latest_version() == v1


def test_insert_missing_dedups_source(tmp_table_dir):
    t, _ = _build(tmp_table_dir, n=4)
    dup = _seq_table(["y-1", "y-1", "y-2"], salt=3)
    res = insert_missing(t, ray.data.from_arrow(dup))
    assert res["rows_inserted"] == 2  # y-1 once, y-2 once
    got = [r["doc_id"] for r in t.scan().take_all()]
    assert sorted(got).count("y-1") == 1


def test_insert_missing_empty_and_all_matched(tmp_table_dir):
    t, ids = _build(tmp_table_dir, n=6)
    v0 = t.latest_version()
    res = insert_missing(t, ray.data.from_arrow(_seq_table(ids[:3], salt=1)))
    assert res == {"version": v0, "rows_inserted": 0, "rows_skipped": 3}
    assert t.latest_version() == v0  # no empty commit


def test_insert_missing_stale_pin_fails_loudly(tmp_table_dir):
    t, ids = _build(tmp_table_dir, n=6)
    v0 = t.latest_version()
    t.commit_append(ray.data.from_arrow(_seq_table(["z-1"], salt=5)))
    with pytest.raises(Exception, match="optimistic commit failed"):
        insert_missing(
            t,
            ray.data.from_arrow(_seq_table(["z-2"], salt=6)),
            expected_parent=v0,
        )
    # the failed op must not have landed anything
    got = [r["doc_id"] for r in t.scan().take_all()]
    assert "z-2" not in got


def test_insert_missing_shuffle_all_new_keys(tmp_table_dir):
    # regression: zero range-overlapping fragments on the shuffle path
    # (a bulk feed of entirely fresh keys above the table's range) must
    # insert everything, not crash in scan_fragments
    from fupi_ray.config import EngineConfig

    cfg = EngineConfig(merge_broadcast_max_keys=1)
    t = Table.create(tmp_table_dir, config=cfg)
    ids = [f"doc-{i:06d}" for i in range(8)]
    t.commit_append(ray.data.from_arrow(_seq_table(ids)), target_fragment_rows=4)
    src = ray.data.from_arrow(_seq_table(["zzz-1", "zzz-2", "zzz-3"], salt=2))
    res = insert_missing(t, src)
    assert res["rows_inserted"] == 3 and res["rows_skipped"] == 0
    assert t.scan().count() == 11


def test_insert_missing_shuffle_strategy_equivalent(tmp_table_dir):
    # force the anti-join path by dropping the broadcast ceiling
    from fupi_ray.config import EngineConfig

    cfg = EngineConfig(merge_broadcast_max_keys=1)
    ids = [f"doc-{i:06d}" for i in range(12)]
    t = Table.create(tmp_table_dir, config=cfg)
    t.commit_append(ray.data.from_arrow(_seq_table(ids)), target_fragment_rows=4)
    src = ray.data.from_arrow(_seq_table(ids[:4] + ["w-1", "w-2"], salt=11))
    res = insert_missing(t, src)
    assert res["rows_inserted"] == 2 and res["rows_skipped"] == 4
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == sorted(ids + ["w-1", "w-2"])


def test_insert_missing_concurrent_no_double_insert(tmp_table_dir):
    # two racers replay the SAME feed concurrently: the snapshot pin
    # guarantees at most one lands; the loser fails loudly (never
    # silently double-inserts). A retry of the loser is then a no-op.
    import threading

    t, ids = _build(tmp_table_dir, n=20)
    feed = _seq_table(ids[:5] + ["r-1", "r-2", "r-3"], salt=21)
    results, errors = [], []

    def racer():
        try:
            results.append(insert_missing(Table(tmp_table_dir), ray.data.from_arrow(feed)))
        except Exception as e:  # noqa: BLE001 - assert on it below
            errors.append(e)

    th = [threading.Thread(target=racer) for _ in range(2)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    inserted = sum(r["rows_inserted"] for r in results)
    # exactly one racer inserted the 3 new rows; the other either lost
    # the commit race (error) or ran after and skipped everything
    assert inserted == 3, (results, errors)
    got = [r["doc_id"] for r in t.scan().take_all()]
    assert sorted(got).count("r-1") == 1
    assert len(got) == 23
    # loser retry: clean no-op
    r = insert_missing(t, ray.data.from_arrow(feed))
    assert r["rows_inserted"] == 0 and r["rows_skipped"] == 8
