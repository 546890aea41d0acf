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

from fupi_ray.functions.hashing import mix64, stable_hash


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

class MinHashStage:
    """Per-batch MinHash signatures (stateful: per-permutation salts
    generated once per actor from a fixed seed).

    Shingles = word ``shingle_size``-grams; a gram's 64-bit hash is a
    vectorized mix of its word hashes (no gram strings are ever
    built). signature[p] = min over shingles of mix64(h ^ salt_p) —
    one (P × S) uint64 broadcast per doc instead of object-dtype
    Mersenne-prime bigint math. Emits one row per (doc, band):
    ``(id, band, band_key)`` — ready for the LSH bucket groupby.
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
        self.salts = rng.integers(0, 2**63, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.word_re = re.compile(r"\w+", re.U)

    def shingle_hashes(self, text: str) -> np.ndarray:
        words = self.word_re.findall((text or "").lower())
        if not words:
            return np.array([0], dtype=np.uint64)
        wh = stable_hash(np.array(words, dtype=object))
        k = self.shingle
        if len(wh) < k:
            g = wh[:1]
            for i in range(1, len(wh)):
                g = mix64(g ^ wh[i : i + 1])
            return g.astype(np.uint64)
        g = wh[: len(wh) - k + 1].copy()
        for off in range(1, k):
            g = mix64(g ^ wh[off : off + len(g)])
        return np.unique(g)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        return mix64(h[None, :] ^ self.salts[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.string()),
                    "band": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                }
            )
        sigs = np.stack([self.signature(t) for t in texts])  # (n, P)
        # fold each band's rows into one 64-bit key, vectorized over docs
        chunks = sigs.reshape(n, self.bands, self.rows_per_band)
        key = chunks[:, :, 0]
        for r in range(1, self.rows_per_band):
            key = mix64(key ^ chunks[:, :, r])
        out_ids = np.repeat(np.asarray(ids, dtype=object), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "id": pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(key.reshape(-1).astype(np.int64), pa.int64()),
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

    pairs = _grouped_pairs(sig, ["band", "band_key"], max_group=64)
    # distinct pairs (a pair can fire in several bands)
    return dedup_pairs(pairs)


def _grouped_pairs(
    sig: ray.data.Dataset,
    key_cols: list[str],
    max_group: int = 64,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """All (a<b) id pairs sharing identical ``key_cols`` values.

    One hash-bucket shuffle (NOT a per-key groupby -- 10^5+ distinct
    band keys would mean 10^5+ one-row python group calls); inside each
    bucket, group boundaries are found vectorized on the sorted frame
    and only multi-member groups (the rare ones) build pairs. Groups
    above ``max_group`` (degenerate/boilerplate content) emit a star
    around the minimum id, keeping output linear."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_bucket", pa.array([], pa.int32()))
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in key_cols:
            h = mix64(h ^ stable_hash(batch[c]))
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dtype = g["id"].dtype
        g = g.sort_values([*key_cols, "id"], kind="mergesort")
        ids = g["id"].to_numpy()
        change = np.ones(len(g), dtype=bool)
        change[1:] = False
        for c in key_cols:
            k = g[c].to_numpy()
            change[1:] |= k[1:] != k[:-1]
        starts = np.nonzero(change)[0]
        sizes = np.diff(np.append(starts, len(g)))
        ra: list = []
        rb: list = []
        for s, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            grp = np.unique(ids[s : s + sz])
            if len(grp) < 2:
                continue
            if len(grp) > max_group:
                ra.extend([grp[0]] * (len(grp) - 1))
                rb.extend(grp[1:])
            else:
                iu = np.triu_indices(len(grp), k=1)
                ra.extend(grp[iu[0]])
                rb.extend(grp[iu[1]])
        return pd.DataFrame(
            {"id_a": pd.Series(ra, dtype=dtype), "id_b": pd.Series(rb, dtype=dtype)}
        )

    return (
        sig.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


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

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_bucket", pa.array([], pa.int32()))
        h = mix64(
            stable_hash(batch["band"].to_numpy(zero_copy_only=False).astype(np.int64))
            ^ stable_hash(batch["band_key"].to_numpy(zero_copy_only=False).astype(np.int64))
        )
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(64)).astype(np.int32))
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dtype = g["id"].dtype
        g = g.sort_values(["band", "band_key", "id"], kind="mergesort")
        kb = g["band"].to_numpy()
        kk = g["band_key"].to_numpy()
        ids = g["id"].to_numpy()
        sims = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        change = np.ones(len(g), dtype=bool)
        change[1:] = (kb[1:] != kb[:-1]) | (kk[1:] != kk[:-1])
        starts = np.nonzero(change)[0]
        sizes = np.diff(np.append(starts, len(g)))
        rows_a, rows_b = [], []
        for s, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            gi, gs = ids[s : s + sz], sims[s : s + sz]
            keep = np.ones(sz, dtype=bool)
            keep[1:] = gi[1:] != gi[:-1]
            gi, gs = gi[keep], gs[keep]
            for i in range(len(gi) - 1):
                x = np.bitwise_xor(gs[i + 1 :], gs[i])
                ham = _popcount64(x)
                for j in np.nonzero(ham <= max_hamming)[0]:
                    rows_a.append(gi[i])
                    rows_b.append(gi[i + 1 + j])
        return pd.DataFrame(
            {"id_a": pd.Series(rows_a, dtype=dtype), "id_b": pd.Series(rows_b, dtype=dtype)}
        )

    pairs = (
        sig.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return dedup_pairs(pairs)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


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
