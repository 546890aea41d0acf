"""Property-based tests (SURVEY.md §5.5): random small tables with
n_tok skew and duplicate merge keys → invariants that must hold for
ANY input: content preservation through compact+cluster, per-key
last-write-wins through MERGE, and no live manifest referencing a
GC'd fragment after expiry.

Examples are deliberately few (each drives real Ray pipelines); the
strategies vary the shapes hypothesis is good at finding edge cases
in: empty sources, all-duplicate sources, single-row tables,
maximally skewed token lengths.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fupi_ray.config import EngineConfig
from fupi_ray.ops import cluster, compact, expire_snapshots, merge_into
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024, compact_min_fill=0.5)

_ex = [0]


def _tmpdir() -> str:
    _ex[0] += 1
    d = f"/tmp/fupi_prop/{os.getpid()}-{_ex[0]}"
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return d


@st.composite
def seq_table(draw, max_rows=60, id_pool=40, unique_ids=True):
    """Random sequences Arrow table; skewed token lengths; ids drawn
    from a small pool so merge sources collide with targets."""
    n = draw(st.integers(0, min(max_rows, id_pool) if unique_ids else max_rows))
    ids = draw(
        st.lists(
            st.integers(0, id_pool - 1), min_size=n, max_size=n, unique=unique_ids
        )
    )
    lens = draw(st.lists(st.integers(1, 50), min_size=n, max_size=n))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    vals = rng.integers(0, 50257, size=int(offsets[-1]), dtype=np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
    srcs = rng.choice(["cc", "wiki", "code"], size=n)
    order = np.arange(n, dtype=np.int64) + draw(st.integers(0, 1000))
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:012d}" for i in ids], pa.string()),
            "tokens": tokens.cast(pa.list_(pa.int32())),
            "n_tok": pa.array(np.asarray(lens, dtype=np.int32), pa.int32()),
            "source": pa.array(srcs.astype(str), pa.string()),
        }
    ), pa.array(order)


def _content(table: Table, version=None):
    rows = table.scan(version).take_all()
    return sorted((r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"]) for r in rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=seq_table())
def test_compact_cluster_preserve_any_table(data):
    tbl, _ = data
    t = Table.create(_tmpdir(), config=CFG)
    t.commit_append(ray.data.from_arrow(tbl), target_fragment_rows=7)
    before = _content(t)
    compact(t)
    assert _content(t) == before
    cluster(t, curve="zorder")
    assert _content(t) == before
    cluster(t, curve="hilbert")
    assert _content(t) == before


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(base=seq_table(unique_ids=True), src=seq_table(unique_ids=False))
def test_merge_lww_any_source(base, src):
    base_tbl, _ = base
    src_tbl, src_order = src
    t = Table.create(_tmpdir(), config=CFG)
    t.commit_append(ray.data.from_arrow(base_tbl), target_fragment_rows=9)
    src_full = src_tbl.append_column("_src_order", src_order)
    v0 = t.latest_version()
    merge_into(t, ray.data.from_arrow(src_full), strategy="broadcast")

    # oracle: keep-first per doc_id from source (min _src_order, ties by
    # occurrence order in the table), plus untouched base rows
    winner: dict = {}
    orders = src_order.to_pylist()
    for i in range(src_tbl.num_rows):
        d = src_tbl["doc_id"][i].as_py()
        o = orders[i]
        if d not in winner or o < winner[d][0]:
            winner[d] = (
                o,
                (
                    d,
                    tuple(src_tbl["tokens"][i].as_py()),
                    src_tbl["n_tok"][i].as_py(),
                    src_tbl["source"][i].as_py(),
                ),
            )
    expected = {d: w[1] for d, w in winner.items()}
    for i in range(base_tbl.num_rows):
        d = base_tbl["doc_id"][i].as_py()
        if d not in expected:
            expected[d] = (
                d,
                tuple(base_tbl["tokens"][i].as_py()),
                base_tbl["n_tok"][i].as_py(),
                base_tbl["source"][i].as_py(),
            )
    got = _content(t)
    assert got == sorted(expected.values())
    # snapshot isolation: pre-merge version unchanged
    assert _content(t, v0) == sorted(
        (
            base_tbl["doc_id"][i].as_py(),
            tuple(base_tbl["tokens"][i].as_py()),
            base_tbl["n_tok"][i].as_py(),
            base_tbl["source"][i].as_py(),
        )
        for i in range(base_tbl.num_rows)
    )


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=seq_table(max_rows=40))
def test_expire_never_breaks_live_versions(data):
    tbl, _ = data
    t = Table.create(_tmpdir(), config=CFG)
    t.commit_append(ray.data.from_arrow(tbl), target_fragment_rows=5)
    compact(t)
    cluster(t, curve="zorder")
    keep = t.latest_version()
    expire_snapshots(t, keep_last=1)
    # every fragment referenced by a surviving manifest must exist
    for v in t.versions():
        for f in t.manifest(v).fragments:
            assert os.path.exists(os.path.join(t.table_dir, f.path)), (v, f.path)
    assert t.latest_version() == keep
    assert t.scan().count() == tbl.num_rows


# -- distributed joins vs pandas reference ---------------------------------


@st.composite
def join_frames(draw):
    import pandas as pd

    nl = draw(st.integers(0, 60))
    nr = draw(st.integers(0, 40))
    key_space = draw(st.integers(1, 20))
    lk = draw(st.lists(st.integers(0, key_space), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.integers(0, key_space), min_size=nr, max_size=nr))
    left = pd.DataFrame(
        {"k": np.array(lk, dtype=np.int64), "x": np.arange(nl, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.array(rk, dtype=np.int64), "y": np.arange(nr, dtype=np.int64) * 7}
    )
    return left, right


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(frames=join_frames(), how=st.sampled_from(["inner", "left", "semi", "anti"]))
def test_hash_join_any_frames(frames, how):
    import pandas as pd

    from fupi_ray.ops.join import hash_join

    left, right = frames
    got = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="k",
        how=how,
        num_buckets=4,
    ).to_pandas()
    if len(got) == 0 and len(got.columns) == 0:
        got = left.iloc[0:0].copy()  # an all-empty result carries no schema
        if how in ("inner", "left"):
            got["y"] = np.array([], dtype=np.int64)
    if how in ("inner", "left"):
        exp = left.merge(right, on="k", how=how)
        assert sorted(map(tuple, got.fillna(-9).to_numpy().tolist())) == sorted(
            map(tuple, exp.fillna(-9).to_numpy().tolist())
        )
    elif how == "semi":
        exp = left[left["k"].isin(set(right["k"]))]
        assert sorted(got["x"]) == sorted(exp["x"])
    else:
        exp = left[~left["k"].isin(set(right["k"]))]
        assert sorted(got["x"]) == sorted(exp["x"])


@st.composite
def asof_frames(draw):
    import pandas as pd

    nl = draw(st.integers(0, 50))
    nr = draw(st.integers(0, 50))
    keys = draw(st.integers(1, 6))
    lts = draw(st.lists(st.integers(0, 1000), min_size=nl, max_size=nl))
    rts = draw(st.lists(st.integers(0, 1000), min_size=nr, max_size=nr))
    lk = draw(st.lists(st.integers(0, keys), min_size=nl, max_size=nl))
    rk = draw(st.lists(st.integers(0, keys), min_size=nr, max_size=nr))
    left = pd.DataFrame(
        {"k": np.array(lk, dtype=np.int64), "t": np.array(lts, dtype=np.int64),
         "lid": np.arange(nl, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.array(rk, dtype=np.int64), "t": np.array(rts, dtype=np.int64),
         "rid": np.arange(nr, dtype=np.int64)}
    )
    return left, right


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(frames=asof_frames())
def test_asof_join_any_frames(frames):
    import pandas as pd

    from fupi_ray.ops.join import asof_join

    left, right = frames
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="k",
        on="t",
        num_buckets=4,
        how="inner",
    ).to_pandas()
    # reference: dedupe right ties (max rid per (k,t)), then merge_asof
    r = right.sort_values(["t", "rid"], kind="mergesort").drop_duplicates(
        subset=["k", "t"], keep="last"
    )
    exp = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        r.sort_values("t", kind="mergesort"),
        on="t",
        by="k",
        direction="backward",
    )
    exp = exp[exp["rid"].notna()]
    if len(got) == 0 and len(exp) == 0:
        return  # an all-empty result may carry no schema
    assert sorted(zip(got["lid"], got["rid"])) == sorted(
        zip(exp["lid"], exp["rid"].astype(np.int64))
    )
