"""Deduplication stages: exact, MinHash+LSH, SimHash, char/ngram
Jaccard, embedding-cosine near-dup.

The reference's only dedup is exact first-wins ``drop_duplicates``
on the driver (fupi/embedders.py:92, SURVEY.md §2.5 A2/A4); at 100 TB
that becomes a hash-shuffle, and a training-data pipeline additionally
needs near-dup families. Shared pattern: per-batch vectorized signature
→ hash-bucket shuffle (``groupby`` on a bucket column, NOT per-key
groups — millions of tiny groups would serialize) → vectorized
resolution inside each bucket.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from fupi_ray.functions.hashing import stable_hash


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep one row per distinct ``key_col`` — the row with the minimum
    ``id_col`` (order-independent, so the duckdb oracle can reproduce
    it with ``row_number() OVER (PARTITION BY key ORDER BY id)``).

    Two-phase: (1) per-batch local dedup (vectorized, shrinks the
    shuffle), (2) hash-bucket shuffle + per-bucket vectorized dedup.
    Scales: the exchange moves at most one row per distinct key per
    input block.
    """

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([key_col, id_col], kind="mergesort").drop_duplicates(
            subset=[key_col], keep="first"
        )
        b = (stable_hash(df[key_col].to_numpy()) % np.uint64(num_buckets)).astype(np.int32)
        df["_bucket"] = b
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, id_col], kind="mergesort").drop_duplicates(
            subset=[key_col], keep="first"
        )
        return g.drop(columns=["_bucket"])

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHashStage:
    """Per-batch MinHash signatures (stateful: permutation coefficients
    generated once per actor from a fixed seed).

    Shingles = word ``shingle_size``-grams hashed with the stable
    64-bit hash; signature[p] = min over shingles of (a_p * h + b_p)
    mod M. Emits one row per (doc, band): ``(id, band, band_key)`` —
    ready for the LSH bucket groupby.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        shingle_size: int = 3,
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle_size
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.word_re = re.compile(r"\w+", re.U)

    def shingle_hashes(self, text: str) -> np.ndarray:
        words = self.word_re.findall((text or "").lower())
        if len(words) < self.shingle:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [
                " ".join(words[i : i + self.shingle])
                for i in range(len(words) - self.shingle + 1)
            ]
        return np.unique(stable_hash(np.array(grams, dtype=object)))

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text).astype(object)  # object → exact big-int math
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(vals, axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_id.append(i)
                out_band.append(band)
                out_key.append(key)
        return pa.table(
            {
                "id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.string()),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    doc → (band, band_key) rows → groupby band bucket → pairs (a<b),
    then distinct pairs. The per-bucket pair fan-out is capped by
    bucket size; huge buckets (degenerate content) emit pairs against
    the bucket minimum only, keeping output linear.
    """
    sig = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            text_col=text_col,
            id_col=id_col,
            num_perm=num_perm,
            bands=bands,
            shingle_size=shingle_size,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=g["id"].dtype), "id_b": pd.Series([], dtype=g["id"].dtype)}
            )
        if len(ids) > 64:  # degenerate bucket: star around the minimum
            a = [ids[0]] * (len(ids) - 1)
            b = ids[1:]
        else:
            a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    pairs = sig.groupby(["band", "band_key"]).map_groups(bucket_pairs, batch_format="pandas")
    # distinct pairs (a pair can fire in several bands)
    return dedup_pairs(pairs)


def dedup_pairs(pairs: ray.data.Dataset, num_buckets: int = 32) -> ray.data.Dataset:
    def add_b(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_bucket", pa.array([], pa.int32()))
        h = stable_hash(batch["id_a"]) ^ stable_hash(batch["id_b"])
        return batch.append_column("_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["_bucket"])

    return pairs.map_batches(add_b, batch_format="pyarrow").groupby("_bucket").map_groups(
        uniq, batch_format="pandas"
    )


def verify_jaccard_pairs(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    threshold: float = 0.7,
) -> pd.DataFrame:
    """Verify candidate pairs with true shingle Jaccard.

    Candidates are a small set (near-dup rate is low); their texts are
    broadcast-collected once and verified on the driver — the scale
    path would chunk pairs into tasks with a broadcast text dict.
    """
    pair_df = pairs.to_pandas()
    if pair_df.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    cand_ids = set(pair_df["id_a"]) | set(pair_df["id_b"])
    stage = MinHashStage(text_col=text_col, id_col=id_col, shingle_size=shingle_size)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in cand_ids for i in batch[id_col].to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    texts = {r[id_col]: r[text_col] for r in ds.map_batches(grab, batch_format="pyarrow").take_all()}
    sets = {i: set(stage.shingle_hashes(t)) for i, t in texts.items()}
    jac = []
    for a, b in zip(pair_df["id_a"], pair_df["id_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        inter = len(sa & sb)
        union = len(sa | sb) or 1
        jac.append(inter / union)
    pair_df["jaccard"] = np.round(jac, 4)
    return pair_df[pair_df["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash per doc + 4×16-bit band keys for bucketing.

    Near-dup pairs differ in ≤3 bits ⇒ at least one 16-bit band is
    identical (pigeonhole) — the standard Manku/Jain/Sarma trick.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.word_re = re.compile(r"\w+", re.U)

    def simhash(self, text: str) -> int:
        words = self.word_re.findall((text or "").lower())
        if not words:
            return 0
        hashes = stable_hash(np.array(words, dtype=object))
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = bits.sum(axis=0) * 2 - len(words)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sh = np.array([self.simhash(t) for t in batch[self.text_col].to_pylist()], dtype=np.uint64)
        out_id, out_band, out_key, out_sim = [], [], [], []
        for i, s in zip(ids, sh):
            for band in range(4):
                out_id.append(i)
                out_band.append(band)
                out_key.append(int((s >> np.uint64(band * 16)) & np.uint64(0xFFFF)))
                out_sim.append(int(s) - (1 << 64) if s >= (1 << 63) else int(s))
        return pa.table(
            {
                "id": pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(out_sim, pa.int64()),
            }
        )


def simhash_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    sig = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dtype = g["id"].dtype
        g = g.drop_duplicates(subset=["id"]).sort_values("id")
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=dtype), "id_b": pd.Series([], dtype=dtype)}
            )
        ids = g["id"].tolist()
        sims = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        rows_a, rows_b = [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(sims[i + 1 :], sims[i])
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(ham <= max_hamming)[0]:
                rows_a.append(ids[i])
                rows_b.append(ids[i + 1 + j])
        return pd.DataFrame(
            {"id_a": pd.Series(rows_a, dtype=dtype), "id_b": pd.Series(rows_b, dtype=dtype)}
        )

    pairs = sig.groupby(["band", "band_key"]).map_groups(bucket_pairs, batch_format="pandas")
    return dedup_pairs(pairs)


# ---------------------------------------------------------------------------
# Character-set Jaccard (duckdb-compatible) near-dup
# ---------------------------------------------------------------------------


def char_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.98,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("source", "lang"),
) -> ray.data.Dataset:
    """All-pairs distinct-character Jaccard within blocking groups —
    semantics chosen to equal duckdb's ``jaccard(s1, s2)`` so the
    oracle can verify it. Blocking keeps the per-group O(n²) bounded."""

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        sets = [frozenset((t or "").lower()) for t in g[text_col]]
        ra, rb, rj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j]) or 1
                jac = inter / union
                if jac >= threshold:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rj.append(round(jac, 4))
        return pd.DataFrame({"id_a": ra, "id_b": rb, "jacc": rj})

    return ds.groupby(list(block_cols)).map_groups(grp, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
) -> ray.data.Dataset:
    """Pairs with cosine ≥ threshold inside blocking groups, via one
    numpy matmul per group (vectorized; no per-pair Python)."""

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        M = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        cos = Mn @ Mn.T
        iu = np.triu_indices(len(ids), k=1)
        mask = cos[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "cos": np.round(cos[iu][mask], 4),
            }
        )

    return ds.groupby(block_col).map_groups(grp, batch_format="pandas")
