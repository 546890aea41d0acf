"""Dataflow stage tests: text analysis, dedup family, similarity,
multimodal plumbing — the SURVEY.md §2 operator conformance layer."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_token_count_and_quality():
    from fupi_ray.stages.text import quality_score, token_count

    t = pa.table({"text": ["hello world  foo", "one"]})
    out = token_count(t)
    assert out["n_words"].to_pylist() == [3, 1]
    q = quality_score(pa.table({"text": ["a, b! c"]}))
    assert q["n_words"].to_pylist() == [3]
    assert q["punct_ratio"].to_pylist() == [round(2 / 7, 4)]


def test_remove_newlines_and_filter():
    from fupi_ray.stages.text import quality_filter, remove_newlines

    t = pa.table({"text": ["a\nb", None, "xyzw"]})
    assert remove_newlines(t, ("text",))["text"].to_pylist() == ["a b", None, "xyzw"]
    assert quality_filter(t, "text").num_rows == 1  # only "xyzw" (len>=4, non-null)


def test_fingerprint_matches_duckdb():
    import duckdb

    from fupi_ray.stages.text import fingerprint

    t = pa.table({"doc_id": [1], "text": ["Hello, World! 42\n"]})
    fp = fingerprint(t)["fp"][0].as_py()
    exp = duckdb.sql(
        "SELECT md5(regexp_replace(lower('Hello, World! 42\n'), '[^a-z0-9]', '', 'g'))"
    ).fetchone()[0]
    assert fp == exp


def test_langid_stage():
    from fupi_ray.stages.text import LangIdStage

    s = LangIdStage()
    t = pa.table({"text": ["the cat and the dog is here", "der hund ist nicht da", "12345"]})
    out = s(t)
    assert out["pred_lang"].to_pylist() == ["en", "de", "unknown"]


def test_dedup_exact_minid():
    from fupi_ray.stages.dedup import dedup_exact

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [3, 1, 2, 5], "k": ["a", "a", "b", "b"]})
    )
    out = dedup_exact(ds, key_col="k", id_col="doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_minhash_identical_docs_pair():
    from fupi_ray.stages.dedup import minhash_lsh_candidates, verify_jaccard_pairs

    text = "the quick brown fox jumps over the lazy dog again and again today"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [text, text + " extra", "completely different words entirely unrelated content here"],
            }
        )
    )
    cand = minhash_lsh_candidates(ds)
    verified = verify_jaccard_pairs(ds, cand, threshold=0.5).to_pandas()
    pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_near_identical():
    from fupi_ray.stages.dedup import simhash_candidates

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [text, text, "x y z w v u t s r q p o n m l k"],
            }
        )
    )
    pairs = set(zip(*[simhash_candidates(ds).to_pandas()[c] for c in ("id_a", "id_b")]))
    assert (1, 2) in pairs


def test_topk_cosine_exact():
    from fupi_ray.stages.similarity import topk_cosine

    vecs = np.eye(4, dtype=np.float32).tolist() + [[0.9, 0.1, 0.0, 0.0]]
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(5), pa.int64()), "embedding": vecs})
    )
    out = topk_cosine(ds, np.array([1.0, 0.0, 0.0, 0.0]), k=2).to_pandas()
    assert out["vec_id"].tolist() == [0, 4]


def test_ivf_recall_on_testdata():
    """IVF probe of 3/8 buckets still finds most of the exact top-10."""
    from fupi_ray.pipelines.queries import q_ivf_topk, q_topk_cosine

    exact = set(q_topk_cosine(SF).to_pandas()["vec_id"])
    approx = set(q_ivf_topk(SF).to_pandas()["vec_id"])
    assert len(exact & approx) >= 5


def test_multimodal_stub_plumbing():
    from fupi_ray.stages.multimodal import DecodeStub, attach_payload

    t = attach_payload(pa.table({"doc_id": [1], "text": ["hi"]}))
    assert t["n_bytes"].to_pylist() == [2]
    out = DecodeStub(real=False)(t)
    import hashlib

    assert out["feat_sha256"][0].as_py() == hashlib.sha256(b"hi").hexdigest()
    with pytest.raises(NotImplementedError):
        DecodeStub(real=True)


def test_char_jaccard_matches_duckdb_semantics():
    import duckdb

    from fupi_ray.stages.dedup import char_jaccard_pairs

    a, b = "the quick brown fox", "the quick brown fax!"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [a, b],
                "source": ["s", "s"],
                "lang": ["en", "en"],
            }
        )
    )
    exp = duckdb.sql(f"SELECT jaccard(lower('{a}'), lower('{b}'))").fetchone()[0]
    got = char_jaccard_pairs(ds, threshold=0.0).to_pandas()
    assert len(got) == 1
    assert abs(got["jacc"][0] - round(exp, 4)) < 1e-9


def test_embedding_neardup_finds_duplicate():
    from fupi_ray.stages.dedup import embedding_neardup_pairs

    v = np.random.default_rng(0).normal(size=8).tolist()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2, 3], pa.int64()),
                "embedding": [v, v, (np.array(v) * -1).tolist()],
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        )
    )
    out = embedding_neardup_pairs(ds, threshold=0.99).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(1, 2)}
