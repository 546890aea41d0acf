"""Token-budget mixing (stages/mix.py): the distributed prefix
selection must equal the single-process window-function oracle for
BOTH hash paths, respect budgets exactly, stay deterministic across
block layouts, and handle the edge shapes (no budget, zero budget,
budget exceeding the corpus)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from fupi_ray.functions.hashing import stable_hash
from fupi_ray.stages.mix import token_budget_mix


def corpus(n: int = 400, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    src = rng.choice(["a", "b", "c"], size=n)
    tok = rng.integers(10, 400, size=n).astype(np.int64)
    ids = np.array([f"d{i:06d}" for i in range(n)], dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "source": pa.array(src, pa.string()),
            "n_tok": pa.array(tok),
        }
    )


def oracle(df: pd.DataFrame, budgets: dict, default) -> pd.DataFrame:
    """pandas window oracle: cumulative n_tok over (key, doc_id) order
    per source, keep while cum <= budget."""

    def key(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    df = df.copy()
    df["u"] = df.doc_id.map(key)
    df = df.sort_values(["source", "u", "doc_id"])
    df["cum"] = df.groupby("source").n_tok.cumsum()
    lim = df.source.map(lambda s: budgets.get(s, default))
    out = df[df.cum <= lim.fillna(np.inf)]
    return (
        out.drop(columns=["u", "cum"]).sort_values("doc_id").reset_index(drop=True)
    )


def fast_oracle(df: pd.DataFrame, budgets: dict, default) -> pd.DataFrame:
    df = df.copy()
    df["u"] = (
        stable_hash(df.doc_id.to_numpy(dtype=object)) >> np.uint64(32)
    ).astype(np.uint32)
    df = df.sort_values(["source", "u", "doc_id"])
    df["cum"] = df.groupby("source").n_tok.cumsum()
    lim = df.source.map(lambda s: budgets.get(s, default))
    out = df[df.cum <= lim.fillna(np.inf)]
    return (
        out.drop(columns=["u", "cum"]).sort_values("doc_id").reset_index(drop=True)
    )


BUDGETS = {"a": 3_000, "b": 800}


@pytest.mark.parametrize("hash_fn,orc", [("md5", oracle), ("fast", fast_oracle)])
def test_mix_matches_window_oracle(hash_fn, orc):
    t = corpus()
    ds = ray.data.from_arrow(t).repartition(13)
    got = (
        token_budget_mix(ds, BUDGETS, default_budget=1_500, hash_fn=hash_fn, num_buckets=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = orc(t.to_pandas(), BUDGETS, 1_500)
    pd.testing.assert_frame_equal(got, want)
    # budgets are hard ceilings
    sums = got.groupby("source").n_tok.sum()
    assert sums.get("a", 0) <= 3_000
    assert sums.get("b", 0) <= 800
    assert sums.get("c", 0) <= 1_500


def test_mix_layout_independent():
    t = corpus()
    outs = []
    for nblocks in (1, 7, 31):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        outs.append(
            token_budget_mix(ds, BUDGETS, default_budget=1_500, num_buckets=32)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_mix_edge_budgets():
    t = corpus(100)
    ds = ray.data.from_arrow(t)
    # no budget anywhere: pass-through
    all_rows = token_budget_mix(ds, {}, default_budget=None).to_pandas()
    assert len(all_rows) == 100
    # zero budget: nothing survives for that source, others untouched
    zero = token_budget_mix(ds, {"a": 0}, default_budget=None).to_pandas()
    assert "a" not in set(zero.source)
    assert len(zero) == len(t.to_pandas().query("source != 'a'"))
    # budget above the corpus: everything kept
    big = token_budget_mix(ds, {}, default_budget=10**9).to_pandas()
    assert len(big) == 100


def test_mix_validates_inputs():
    ds = ray.data.from_arrow(corpus(10))
    with pytest.raises(ValueError, match="hash_fn"):
        token_budget_mix(ds, {}, hash_fn="sha")
    with pytest.raises(ValueError, match="power of two"):
        token_budget_mix(ds, {}, num_buckets=100)
