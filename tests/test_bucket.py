"""Storage-bucketed layout + shuffle-free bucketed joins
(fupi_ray/ops/bucket.py): layout purity, join correctness vs the
hash-join twin, zero-exchange plan shape, layout survival under
maintenance (compaction, DV delete, COW delete), and the refusal
contract when appends break the layout."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.ops import (
    BucketLayoutError,
    bucket_join,
    bucket_table,
    compact,
    delete_where,
    read_layout,
)
from fupi_ray.ops.join import hash_join
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024)
N_BUCKETS = 4


@pytest.fixture()
def pair(tmp_path):
    """Two co-bucketable tables: sequences (doc_id, tokens, n_tok,
    source) and a narrow (doc_id, score) side covering a subset."""
    left = write_fragmented_table(
        str(tmp_path / "left"), 1_500, rows_per_fragment=200, config=CFG
    )
    right = Table.create(
        str(tmp_path / "right"),
        schema=pa.schema([("doc_id", pa.string()), ("score", pa.int64())]),
        config=CFG,
    )

    def mk(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.greater(batch["n_tok"], 150))
        return pa.table(
            {"doc_id": sub["doc_id"], "score": pc.cast(sub["n_tok"], pa.int64())}
        )

    right.commit_append(
        left.scan(columns=["doc_id", "n_tok"]).map_batches(mk, batch_format="pyarrow"),
        target_fragment_rows=150,
    )
    return left, right


def joined_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)[sorted(df.columns)]


def expected_join(left, right) -> pd.DataFrame:
    l = left.scan(columns=["doc_id", "source", "n_tok"]).to_pandas()
    r = right.scan().to_pandas()
    df = l.merge(r, on="doc_id", how="inner")
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)[sorted(df.columns)]


def test_bucket_table_layout_is_pure(pair):
    left, _ = pair
    before = left.scan().to_pandas()
    v = bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    m = left.manifest(v)
    assert m.operation == "bucket"
    lay = read_layout(left)
    assert lay == {"key": "doc_id", "num_buckets": N_BUCKETS, "version": v}
    seen = set()
    for f in m.fragments:
        assert f.bucket is not None and 0 <= f.bucket < N_BUCKETS
        tbl = pq.read_table(f"{left.table_dir}/{f.path}", columns=["doc_id"])
        h = stable_hash(tbl["doc_id"]) % np.uint64(N_BUCKETS)
        assert (h == np.uint64(f.bucket)).all(), "fragment not bucket-pure"
        seen.add(f.bucket)
    assert seen == set(range(N_BUCKETS))
    # content-preserving rewrite
    after = left.scan().to_pandas()
    for df in (before, after):
        df["tokens"] = df["tokens"].map(lambda a: tuple(a))
    pd.testing.assert_frame_equal(
        before.sort_values("doc_id").reset_index(drop=True),
        after.sort_values("doc_id").reset_index(drop=True),
    )


def test_bucket_join_matches_hash_join(pair):
    left, right = pair
    want = expected_join(left, right)
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    ds = bucket_join(
        left,
        right,
        on="doc_id",
        columns_left=["doc_id", "source", "n_tok"],
        columns_right=["doc_id", "score"],
    )
    got = joined_df(ds)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the distributed hash-join twin agrees too
    hj = hash_join(
        left.scan(columns=["doc_id", "source", "n_tok"]),
        right.scan(),
        on="doc_id",
        num_buckets=4,
    )
    pd.testing.assert_frame_equal(joined_df(hj), want, check_dtype=False)


def test_bucket_join_plan_has_no_exchange(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    ds = bucket_join(
        left, right, on="doc_id",
        columns_left=["doc_id", "n_tok"], columns_right=["doc_id", "score"],
    )
    ds = ds.materialize()
    stats = ds.stats()
    for marker in ("Sort", "Aggregate", "RandomShuffle", "Repartition"):
        assert marker not in stats, f"unexpected exchange {marker} in plan:\n{stats}"


def test_left_join_pads_nulls(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    df = bucket_join(
        left, right, on="doc_id",
        columns_left=["doc_id", "n_tok"], columns_right=["doc_id", "score"],
        how="left",
    ).to_pandas()
    assert len(df) == 1_500
    matched = df["score"].notna()
    assert matched.sum() == len(expected_join(left, right))
    assert (df.loc[matched, "n_tok"] > 150).all()


def test_join_refuses_untagged_appends(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    left.commit_append(sequences_dataset(100, start=10_000))
    with pytest.raises(BucketLayoutError, match="outside the bucket layout"):
        bucket_join(left, right, on="doc_id")
    # re-bucketing repairs the contract
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    assert bucket_join(
        left, right, on="doc_id",
        columns_left=["doc_id", "n_tok"], columns_right=["doc_id", "score"],
    ).count() > 0


def test_join_refuses_mismatched_layouts(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    with pytest.raises(BucketLayoutError, match="no bucket layout"):
        bucket_join(left, right, on="doc_id")
    bucket_table(right, key="doc_id", num_buckets=2 * N_BUCKETS)
    with pytest.raises(BucketLayoutError, match="bucket counts differ"):
        bucket_join(left, right, on="doc_id")
    with pytest.raises(BucketLayoutError, match="join key"):
        bucket_join(left, right, on="source")


def test_layout_survives_compaction_and_dv_delete(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    want = expected_join(left, right)

    # merge-on-read delete keeps tags (dataclasses.replace)
    delete_where(left, [("n_tok", "between", (200, 260))], mode="dv")
    # compaction packs within buckets only and carries the tag
    compact(left)
    m = left.manifest()
    assert all(f.bucket is not None for f in m.fragments)
    for f in m.fragments:
        tbl = pq.read_table(f"{left.table_dir}/{f.path}", columns=["doc_id"])
        h = stable_hash(tbl["doc_id"]) % np.uint64(N_BUCKETS)
        assert (h == np.uint64(f.bucket)).all(), "compaction mixed buckets"

    got = joined_df(
        bucket_join(
            left, right, on="doc_id",
            columns_left=["doc_id", "source", "n_tok"],
            columns_right=["doc_id", "score"],
        )
    )
    want = want[~want.n_tok.between(200, 260)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_layout_survives_cow_delete(pair):
    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    delete_where(left, [("n_tok", ">", 400)], mode="cow")
    assert all(f.bucket is not None for f in left.manifest().fragments)
    got = joined_df(
        bucket_join(
            left, right, on="doc_id",
            columns_left=["doc_id", "source", "n_tok"],
            columns_right=["doc_id", "score"],
        )
    )
    want = expected_join(left, right)
    want = want[want.n_tok <= 400].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("mode,strategy", [("cow", "broadcast"), ("cow", "shuffle"), ("dv", "broadcast")])
def test_layout_survives_merge(pair, mode, strategy):
    from fupi_ray.fixtures import merge_source_dataset
    from fupi_ray.ops import merge_into

    left, right = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    src = merge_source_dataset(1_500)
    merge_into(left, src, strategy=strategy, mode=mode)
    m = left.manifest()
    assert all(f.bucket is not None for f in m.fragments), "merge de-tagged the layout"
    # every fragment is still bucket-pure — including the merge inserts
    for f in m.fragments:
        tbl = pq.read_table(f"{left.table_dir}/{f.path}", columns=["doc_id"])
        h = stable_hash(tbl["doc_id"]) % np.uint64(N_BUCKETS)
        assert (h == np.uint64(f.bucket)).all(), f"merge mixed buckets in {f.path}"
    # the shuffle-free join still runs and reflects the merge
    got = joined_df(
        bucket_join(
            left, right, on="doc_id",
            columns_left=["doc_id", "source", "n_tok"],
            columns_right=["doc_id", "score"],
        )
    )
    want = expected_join(left, right)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_join_refuses_rollback_across_rebucket(pair, tmp_path):
    """A rollback across a re-bucket leaves fragments tagged under the
    OLD modulus while the sidecar says the new one — validation derives
    from fragment signatures, so the join refuses instead of silently
    dropping cross-modulus matches (review finding)."""
    from fupi_ray.ops import rollback
    from fupi_ray.ops.bucket import fragment_layout

    left, right = pair
    v8 = bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    bucket_table(left, key="doc_id", num_buckets=2 * N_BUCKETS)
    rollback(left, v8)
    # sidecar claims 2*N; live fragments carry sig doc_id%N
    assert read_layout(left)["num_buckets"] == 2 * N_BUCKETS
    assert fragment_layout(left.manifest())["num_buckets"] == N_BUCKETS
    bucket_table(right, key="doc_id", num_buckets=2 * N_BUCKETS)
    with pytest.raises(BucketLayoutError, match="bucket counts differ"):
        bucket_join(left, right, on="doc_id")
    # same modulus on both sides joins fine even with the stale sidecar
    bucket_table(right, key="doc_id", num_buckets=N_BUCKETS)
    got = joined_df(
        bucket_join(
            left, right, on="doc_id",
            columns_left=["doc_id", "source", "n_tok"],
            columns_right=["doc_id", "score"],
        )
    )
    pd.testing.assert_frame_equal(got, expected_join(left, right), check_dtype=False)


def test_bucket_refuses_null_keys(tmp_path):
    import ray.data

    t = Table.create(
        str(tmp_path / "nul"),
        schema=pa.schema([("doc_id", pa.string()), ("v", pa.int64())]),
        config=CFG,
    )
    t.commit_append(
        ray.data.from_arrow(
            pa.table({"doc_id": ["a", None, "c"], "v": [1, 2, 3]})
        )
    )
    with pytest.raises(Exception, match="contains nulls"):
        bucket_table(t, key="doc_id", num_buckets=2)


def test_incremental_rebucket_is_o_new_data(pair):
    """Repairing the layout after an append rewrites ONLY the untagged
    fragments; already-bucketed fragments are kept by reference."""
    left, right = pair
    v1 = bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    tagged_paths = {f.path for f in left.manifest(v1).fragments}
    left.commit_append(sequences_dataset(120, start=20_000, rows_per_partition=60))
    v2 = bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    m = left.manifest(v2)
    props = m.properties
    assert props["incremental"] and props["fragments_kept"] == len(tagged_paths)
    assert tagged_paths <= {f.path for f in m.fragments}, "kept fragments rewritten"
    assert all(f.bucket is not None for f in m.fragments)
    assert left.scan().count() == 1_620
    # idempotent: a fully-bucketed table re-buckets to the SAME version
    assert bucket_table(left, key="doc_id", num_buckets=N_BUCKETS) == v2
    # a different modulus still forces the full rewrite
    v3 = bucket_table(left, key="doc_id", num_buckets=2 * N_BUCKETS)
    assert left.manifest(v3).properties["fragments_kept"] == 0


def test_bucket_tag_prunes_point_lookups(pair):
    left, _ = pair
    bucket_table(left, key="doc_id", num_buckets=N_BUCKETS)
    m = left.manifest()
    some_id = left.scan(columns=["doc_id"]).take(1)[0]["doc_id"]
    pred = [("doc_id", "==", some_id)]
    surviving = [
        f for f in m.fragments
        if __import__("fupi_ray.manifest", fromlist=["m"]).fragment_bucket_may_match(f, pred)
    ]
    # exactly the one bucket's fragments survive the tag prune
    h = int(stable_hash(np.array([some_id], dtype=object))[0] % N_BUCKETS)
    assert surviving and all(f.bucket == h for f in surviving)
    assert len(surviving) < len(m.fragments)
    # end to end: the pruned scan still finds the row
    assert left.scan(predicate=pred).count() == 1
    assert len(left.fragment_paths(predicate=pred)) <= len(surviving)


def test_bucket_prune_is_type_conservative():
    """The tag prune hashes down the COLUMN's kind (from its zone
    entry); mismatched predicate-value types and unhashable inputs
    never prune (review findings: int-vs-float path divergence,
    huge-int OverflowError)."""
    from fupi_ray.manifest import FragmentMeta, fragment_bucket_may_match

    f_str = FragmentMeta(
        path="x", rows=1, bytes=1, sum_n_tok=0,
        zone_map={"k": {"min": "a", "max": "z"}}, bucket=1, bucket_sig="k%4",
    )
    f_float = FragmentMeta(
        path="y", rows=1, bytes=1, sum_n_tok=0,
        zone_map={"k": {"min": 1.5, "max": 9.0}}, bucket=1, bucket_sig="k%4",
    )
    # int predicate on a string column: no prune (conservative pass)
    assert fragment_bucket_may_match(f_str, [("k", "==", 5)])
    # any predicate on a float column: kind unknown to the prune
    assert fragment_bucket_may_match(f_float, [("k", "==", 5)])
    assert fragment_bucket_may_match(f_float, [("k", "==", 5.0)])
    # huge ints must not crash — conservative pass or exact answer
    f_int = FragmentMeta(
        path="z", rows=1, bytes=1, sum_n_tok=0,
        zone_map={"k": {"min": 0, "max": 9}}, bucket=1, bucket_sig="k%4",
    )
    fragment_bucket_may_match(f_int, [("k", "==", 2**63 + 5)])  # no raise
    # matching-kind point lookup DOES prune 3 of 4 tags
    hits = [
        b
        for b in range(4)
        for fm in [FragmentMeta(
            path="p", rows=1, bytes=1, sum_n_tok=0,
            zone_map={"k": {"min": "a", "max": "z"}}, bucket=b, bucket_sig="k%4",
        )]
        if fragment_bucket_may_match(fm, [("k", "==", "hello")])
    ]
    assert len(hits) == 1
    # IN () matches nothing anywhere
    assert not fragment_bucket_may_match(f_str, [("k", "in", [])])
