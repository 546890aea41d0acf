"""decontaminate_table (ops/decontaminate.py): GPT-3-style n-gram
decontamination as a committing table op. Docs carrying any eval
window must drop; everything else must survive byte-identical; the
min_hits bar and short-doc/empty-eval edges must hold."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.ops import decontaminate_table, eval_window_hashes
from fupi_ray.table import Table

WIDTH = 13
MOTIF = list(range(70_001, 70_001 + WIDTH))  # outside the PRNG vocab


def _rng(seed, n):
    return np.random.default_rng(seed).integers(0, 50_000, n).tolist()


def _table_of(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
            "source": pa.array(["s"] * len(rows), pa.string()),
        }
    )


def _eval_ds(seqs):
    return ray.data.from_arrow(
        pa.table({"tokens": pa.array(seqs, pa.list_(pa.int32()))})
    )


def test_contaminated_docs_drop(tmp_table_dir):
    rows = [(f"c-{i}", _rng(i, 40)[:20] + MOTIF + _rng(100 + i, 7)) for i in range(3)]
    rows += [(f"u-{i}", _rng(200 + i, 40)) for i in range(5)]
    t = Table.create(tmp_table_dir)
    t.commit_append(ray.data.from_arrow(_table_of(rows)), target_fragment_rows=3)
    res = decontaminate_table(t, _eval_ds([MOTIF]), width=WIDTH)
    assert res["rows_deleted"] == 3 and res["eval_grams"] == 1
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == [f"u-{i}" for i in range(5)]
    assert res["version"] == t.latest_version()


def test_clean_table_no_commit(tmp_table_dir):
    rows = [(f"u-{i}", _rng(i, 30)) for i in range(6)]
    t = Table.create(tmp_table_dir)
    t.commit_append(ray.data.from_arrow(_table_of(rows)))
    v0 = t.latest_version()
    res = decontaminate_table(t, _eval_ds([MOTIF]), width=WIDTH)
    assert res == {"version": v0, "rows_deleted": 0, "eval_grams": 1}
    assert t.latest_version() == v0


def test_min_hits_requires_k_windows(tmp_table_dir):
    # one motif occurrence = WIDTH stride-1 window? no — ONE window
    # equals the motif exactly; embedding the motif twice (disjoint)
    # yields 2 matching windows
    once = _rng(1, 10) + MOTIF + _rng(2, 10)
    twice = _rng(3, 5) + MOTIF + _rng(4, 5) + MOTIF + _rng(5, 5)
    rows = [("once", once), ("twice", twice), ("clean", _rng(6, 40))]
    t = Table.create(tmp_table_dir)
    t.commit_append(ray.data.from_arrow(_table_of(rows)))
    res = decontaminate_table(t, _eval_ds([MOTIF]), width=WIDTH, min_hits=2)
    assert res["rows_deleted"] == 1
    got = sorted(r["doc_id"] for r in t.scan().take_all())
    assert got == ["clean", "once"]


def test_short_docs_and_empty_eval(tmp_table_dir):
    rows = [("s-0", MOTIF[: WIDTH - 1]), ("s-1", _rng(1, 5))]
    t = Table.create(tmp_table_dir)
    t.commit_append(ray.data.from_arrow(_table_of(rows)))
    v0 = t.latest_version()
    # doc shorter than width can never match
    res = decontaminate_table(t, _eval_ds([MOTIF]), width=WIDTH)
    assert res["rows_deleted"] == 0
    # eval sequences shorter than width yield zero grams -> no-op
    res = decontaminate_table(t, _eval_ds([MOTIF[:5]]), width=WIDTH)
    assert res == {"version": v0, "rows_deleted": 0, "eval_grams": 0}


def test_eval_window_hashes_distinct():
    # overlapping eval sequences share windows; the broadcast set is
    # distinct
    a = MOTIF + [1, 2, 3]
    h = eval_window_hashes(_eval_ds([a, a, MOTIF]), WIDTH)
    assert len(h) == len(np.unique(h)) == 4  # 4 stride-1 windows in a
