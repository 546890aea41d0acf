"""Order-proving sorted scan (Table.order_proof / scan_sorted): the
zone-map disjointness proof, the exchange-free fast path, the sort
fallback on overlapping layouts, and DV/descending correctness."""

import pandas as pd
import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import delete_where
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024)


@pytest.fixture()
def tbl(tmp_path):
    # ordered ingest → per-fragment doc_id ranges are naturally disjoint
    return write_fragmented_table(
        str(tmp_path / "tbl"), 1_200, rows_per_fragment=150, config=CFG
    )


def test_proof_and_fast_path(tbl):
    proof = tbl.order_proof("doc_id")
    assert proof["provable"] and proof["overlapping_pairs"] == 0
    ds = tbl.scan_sorted("doc_id", columns=["doc_id", "n_tok"]).materialize()
    stats = ds.stats()
    assert "Sort" not in stats, f"fast path took the exchange:\n{stats}"
    df = ds.to_pandas()
    assert len(df) == 1_200
    assert df["doc_id"].is_monotonic_increasing
    assert list(df.columns) == ["doc_id", "n_tok"]


def test_descending_and_dv(tbl):
    delete_where(tbl, [("n_tok", "between", (100, 300))], mode="dv")
    df = tbl.scan_sorted("doc_id", columns=["doc_id", "n_tok"], descending=True).to_pandas()
    assert df["doc_id"].is_monotonic_decreasing
    assert not df["n_tok"].between(100, 300).any()
    plain = tbl.scan(columns=["doc_id", "n_tok"]).to_pandas()
    assert len(df) == len(plain)


def test_overlapping_layout_falls_back(tbl):
    # a second interleaved append overlaps every existing range
    tbl.commit_append(sequences_dataset(600, start=17, rows_per_partition=100))
    proof = tbl.order_proof("doc_id")
    assert not proof["provable"] and proof["overlapping_pairs"] > 0
    df = tbl.scan_sorted("doc_id", columns=["doc_id"]).to_pandas()
    assert df["doc_id"].is_monotonic_increasing
    assert len(df) == 1_800


def test_unmapped_column_falls_back(tbl):
    # tokens has no zone map entry → proof must refuse, scan must still sort
    proof = tbl.order_proof("n_tok")
    # n_tok IS zone-mapped but ranges overlap across fragments
    assert not proof["provable"]
    df = tbl.scan_sorted("n_tok", columns=["doc_id", "n_tok"]).to_pandas()
    assert df["n_tok"].is_monotonic_increasing
