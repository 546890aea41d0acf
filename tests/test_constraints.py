"""Commit-time constraints (ops/constraints.py): declaration verifies
existing rows, violating appends/overwrites/merges/stages/updates fail
BEFORE any manifest mutation, valid writes pass through untouched."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    ConstraintViolation,
    drop_constraints,
    read_constraints,
    set_constraints,
    stage_append,
    update_where,
)
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024)

CONS = [
    {"col": "n_tok", "op": ">", "value": 0},
    {"col": "doc_id", "not_null": True},
    {"col": "source", "op": "in", "value": ["cc", "wiki", "code", "books", "forums"]},
]


@pytest.fixture()
def tbl(tmp_path):
    return write_fragmented_table(
        str(tmp_path / "tbl"), 800, rows_per_fragment=200, config=CFG
    )


def bad_rows(n=5, n_tok_val=0):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"bad-{i:03d}" for i in range(n)]),
                "tokens": pa.array([[1, 2]] * n, type=pa.list_(pa.int32())),
                "n_tok": pa.array([n_tok_val] * n, type=pa.int32()),
                "source": pa.array(["cc"] * n),
            }
        )
    )


def test_set_constraints_verifies_existing(tbl):
    checked = set_constraints(tbl, CONS)
    assert checked == 800
    assert read_constraints(tbl.table_dir) == CONS
    # a constraint the current data breaks is refused at declaration
    with pytest.raises(Exception, match="check constraint"):
        set_constraints(tbl, [{"col": "n_tok", "op": ">", "value": 10_000}])
    # ... and the sidecar still holds the previous (valid) set
    assert read_constraints(tbl.table_dir) == CONS


def test_violating_append_fails_before_commit(tbl):
    set_constraints(tbl, CONS)
    v0 = tbl.latest_version()
    with pytest.raises(Exception, match="check constraint"):
        tbl.commit_append(bad_rows(n_tok_val=0))
    assert tbl.latest_version() == v0, "violating append must not commit"
    assert tbl.scan().count() == 800
    # nulls are caught by not_null
    nulls = pa.table(
        {
            "doc_id": pa.array([None], type=pa.string()),
            "tokens": pa.array([[1]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([5], type=pa.int32()),
            "source": pa.array(["cc"]),
        }
    )
    with pytest.raises(Exception, match="not-null"):
        tbl.commit_append(ray.data.from_arrow(nulls))
    # a valid append still lands
    v = tbl.commit_append(sequences_dataset(50, start=5_000))
    assert v == tbl.latest_version()
    assert tbl.scan().count() == 850


def test_violating_stage_and_update(tbl):
    set_constraints(tbl, CONS)
    with pytest.raises(Exception, match="check constraint"):
        stage_append(tbl, bad_rows())
    # scalar UPDATE assignment checked up front, no task launched
    with pytest.raises(ConstraintViolation, match="in"):
        update_where(tbl, [("n_tok", ">", 400)], {"source": "spam"})
    v0 = tbl.latest_version()
    update_where(tbl, [("n_tok", ">", 400)], {"source": "books"})
    assert tbl.latest_version() > v0


def test_violating_merge_source(tbl):
    from fupi_ray.ops import merge_into

    set_constraints(tbl, CONS)
    v0 = tbl.latest_version()
    src = bad_rows(3).map_batches(
        lambda b: b.append_column("_src_order", pa.array(np.arange(b.num_rows))),
        batch_format="pyarrow",
    )
    with pytest.raises(Exception, match="check constraint"):
        merge_into(tbl, src)
    assert tbl.latest_version() == v0


def test_drop_constraints(tbl):
    set_constraints(tbl, CONS)
    drop_constraints(tbl)
    assert read_constraints(tbl.table_dir) == []
    tbl.commit_append(bad_rows())  # anything goes again
    assert tbl.scan().count() == 805


def test_not_null_with_nonnull_default_passes(tmp_path):
    """A batch missing a constrained column is filled from the table
    default downstream — not-null must pass when the default is
    non-null, and a CHECK must evaluate the default (review finding)."""
    import ray.data

    from fupi_ray.ops import add_column

    t = write_fragmented_table(str(tmp_path / "t"), 200, rows_per_fragment=100, config=CFG)
    add_column(t, "lang", "string", default="en")
    set_constraints(t, [{"col": "lang", "not_null": True}])
    pre_evolution_batch = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["x-1"]),
                "tokens": pa.array([[1]], type=pa.list_(pa.int32())),
                "n_tok": pa.array([5], type=pa.int32()),
                "source": pa.array(["cc"]),
            }
        )
    )
    t.commit_append(pre_evolution_batch)  # must NOT raise
    assert t.scan(predicate=[("lang", "==", "en")]).count() == 201
    # a CHECK that the default violates refuses the same batch
    set_constraints(t, [{"col": "lang", "op": "!=", "value": "xx"}])
    add_column(t, "lang2", "string", default="xx")
    set_constraints(t, [{"col": "lang2", "op": "!=", "value": "xx"}], verify_existing=False)
    with pytest.raises(Exception, match="default 'xx' violates"):
        t.commit_append(pre_evolution_batch)


def test_tombstone_merge_skips_constraints(tmp_path):
    """when_matched='delete' feeds are key-only and insert nothing —
    constraints must not reject them (review finding)."""
    import ray.data

    from fupi_ray.ops import merge_into

    t = write_fragmented_table(str(tmp_path / "t"), 300, rows_per_fragment=100, config=CFG)
    set_constraints(t, [{"col": "n_tok", "op": ">", "value": 0}])
    doomed = t.scan(columns=["doc_id"]).limit(25).map_batches(
        lambda b: b.append_column(
            "_src_order", pa.array(np.arange(b.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    merge_into(t, doomed, when_matched="delete")
    assert t.scan().count() == 275


def test_set_constraints_restores_previous_on_failure(tmp_path):
    t = write_fragmented_table(str(tmp_path / "t"), 100, rows_per_fragment=100, config=CFG)
    good = [{"col": "n_tok", "op": ">", "value": 0}]
    set_constraints(t, good)
    with pytest.raises(Exception):
        set_constraints(t, [{"col": "n_tok", "op": ">", "value": 10_000}])
    assert read_constraints(t.table_dir) == good
