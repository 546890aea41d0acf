"""Round-3 regression tests: the five round-2 ADVICE findings
(asof inner-match marker, broadcast-left empty side, large_string
offsets, field-id schema evolution, evolution-only fill_missing)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.ops.join import asof_join, broadcast_join, prepare_broadcast_side


# -- ADVICE 1: asof_join inner must not read payloads for match detection ---


def test_asof_inner_keeps_matched_row_with_null_payload():
    left = pd.DataFrame({"k": ["a", "a"], "t": [5, 50]})
    right = pd.DataFrame(
        {"k": ["a"], "t": [3], "p": pd.array([None], dtype="string")}
    )
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="k",
        on="t",
        how="inner",
        num_buckets=2,
    ).to_pandas()
    # both left rows match the t=3 right row even though its payload is null
    assert len(got) == 2
    assert got["p"].isna().all()


def test_asof_inner_no_payload_columns_still_filters():
    left = pd.DataFrame({"k": ["a", "b"], "t": [5, 5]})
    right = pd.DataFrame({"k": ["a"], "t": [3]})  # no payload at all
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="k",
        on="t",
        how="inner",
        num_buckets=2,
    ).to_pandas()
    # key "b" has no right row -> dropped under inner (was silently left-join)
    assert got["k"].tolist() == ["a"]


# -- ADVICE 2: broadcast left join vs empty small side ----------------------


def test_broadcast_left_join_empty_small_side():
    big = ray.data.from_pandas(pd.DataFrame({"k": [3, 1, 2]}))
    side = prepare_broadcast_side(
        pd.DataFrame({"k": pd.Series([], dtype="int64"), "val": pd.Series([], dtype="object")}),
        on="k",
        value_cols=["val"],
    )
    out = broadcast_join(big, side, on="k", value_cols=["val"], how="left").to_pandas()
    assert len(out) == 3
    assert out["val"].isna().all()
    inner = broadcast_join(big, side, on="k", value_cols=["val"], how="inner").to_pandas()
    assert len(inner) == 0


# -- ADVICE 3: large_string offsets ------------------------------------------


def test_text_kernels_large_string_parity():
    from fupi_ray.functions.textkernels import (
        charset_bitmask,
        rolling_min_hashes,
        string_byte_view,
    )

    texts = ["Hello, World!", "", "aaa bbb ccc", "Zebra quartz"]
    small = pa.array(texts, pa.string())
    large = pa.array(texts, pa.large_string())

    off_s, data_s = string_byte_view(small)
    off_l, data_l = string_byte_view(large)
    np.testing.assert_array_equal(off_s, off_l)
    np.testing.assert_array_equal(data_s[: off_s[-1]], data_l[: off_l[-1]])

    m_s, s_s = charset_bitmask(small)
    m_l, s_l = charset_bitmask(large)
    np.testing.assert_array_equal(m_s, m_l)
    np.testing.assert_array_equal(s_s, s_l)

    pows = np.array([pow(257, 2 - j, 1 << 64) for j in range(3)], dtype=np.uint64)
    np.testing.assert_array_equal(
        rolling_min_hashes(small, 3, pows), rolling_min_hashes(large, 3, pows)
    )


def test_feature_hash_embedder_large_string_parity():
    from fupi_ray.stages.similarity import FeatureHashEmbedder

    texts = ["the quick brown fox", "jumps over", ""]
    emb = FeatureHashEmbedder(text_col="text", dim=16)
    out_s = emb(pa.table({"text": pa.array(texts, pa.string())}))
    out_l = emb(pa.table({"text": pa.array(texts, pa.large_string())}))
    np.testing.assert_array_equal(
        np.asarray(out_s["vec"].combine_chunks().flatten()),
        np.asarray(out_l["vec"].combine_chunks().flatten()),
    )


def test_string_byte_view_rejects_non_string():
    from fupi_ray.functions.textkernels import string_byte_view

    with pytest.raises(TypeError):
        string_byte_view(pa.array([1, 2, 3]))


# -- ADVICE 4: field-id schema evolution -------------------------------------


def _seq_table(ids, source, extra=None):
    cols = {
        "doc_id": pa.array(ids, pa.string()),
        "tokens": pa.array(
            [list(range(i % 4 + 1)) for i in range(len(ids))], pa.list_(pa.int32())
        ),
        "n_tok": pa.array([i % 4 + 1 for i in range(len(ids))], pa.int32()),
        "source": pa.array([source] * len(ids), pa.string()),
    }
    if extra:
        cols.update(extra)
    return pa.table(cols)


def _make_table(tmp_table_dir, rows=8):
    from fupi_ray.table import Table

    t = Table.create(tmp_table_dir)
    t.commit_append(ray.data.from_arrow(_seq_table([f"d{i:03d}" for i in range(rows)], "s0")))
    return t


def test_drop_then_readd_does_not_resurrect_stale_values(tmp_table_dir):
    from fupi_ray.ops.evolve import add_column, drop_column

    t = _make_table(tmp_table_dir)
    add_column(t, "lang", pa.string(), default="bg")
    # materialize a fragment that PHYSICALLY contains lang='xx'
    t.commit_append(
        ray.data.from_arrow(
            _seq_table(["e000", "e001"], "s1", {"lang": pa.array(["xx", "xx"])})
        )
    )
    drop_column(t, "lang")
    add_column(t, "lang", pa.string(), default="fresh")
    out = t.scan(columns=["doc_id", "lang"]).to_pandas()
    # pre-drop physical 'xx' values must NOT come back; every row gets
    # the re-added column's default
    assert set(out["lang"]) == {"fresh"}
    # and the old incarnation's zone map must not prune the new default
    got = t.scan(predicate=[("lang", "==", "fresh")]).to_pandas()
    assert len(got) == 10


def test_predicate_on_evolved_column_not_in_projection(tmp_table_dir):
    from fupi_ray.ops.evolve import add_column

    t = _make_table(tmp_table_dir)
    add_column(t, "score", pa.int64(), default=7)
    t.commit_append(
        ray.data.from_arrow(
            _seq_table(["e000"], "s1", {"score": pa.array([99], pa.int64())})
        )
    )
    # predicate column NOT in the projection; old fragments lack it in
    # the file — scan must apply the default, not fail
    got = t.scan(columns=["doc_id"], predicate=[("score", "==", 7)]).to_pandas()
    assert len(got) == 8
    assert list(got.columns) == ["doc_id"]
    got99 = t.scan(columns=["doc_id"], predicate=[("score", ">", 50)]).to_pandas()
    assert got99["doc_id"].tolist() == ["e000"]


# -- ADVICE 5: fill_missing only for evolution-added columns -----------------


def test_merge_source_missing_core_column_raises(tmp_table_dir):
    from fupi_ray.ops.merge import merge_into

    t = _make_table(tmp_table_dir)
    # 'source' column missing -> must raise, not null-pad
    bad = pa.table(
        {
            "doc_id": pa.array(["z0"], pa.string()),
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="missing table columns"):
        merge_into(t, ray.data.from_arrow(bad), strategy="broadcast")


def test_merge_source_missing_evolved_column_pads(tmp_table_dir):
    from fupi_ray.ops.evolve import add_column
    from fupi_ray.ops.merge import merge_into

    t = _make_table(tmp_table_dir)
    add_column(t, "lang", pa.string(), default="bg")
    # evolution-added 'lang' missing from the source -> padded with default
    src = pa.table(
        {
            "doc_id": pa.array(["z0"], pa.string()),
            "tokens": pa.array([[5]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),
            "source": pa.array(["s9"], pa.string()),
        }
    )
    merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    out = t.scan().to_pandas()
    assert len(out) == 9
    assert set(out["lang"]) == {"bg"}
