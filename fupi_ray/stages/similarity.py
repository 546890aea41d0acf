"""Similarity search over an embedding column.

The reference's retrieval is LanceDB ANN top-k
(``table.search(vec).limit(10)``, fupi/utils.py:149-161 — SURVEY.md
§2.6 O1). Our engine provides:

* ``topk_cosine`` — exact brute-force top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits only its local top-k (per-block partial top-k), and the tiny
  partial stream is resolved with sort+limit. Nothing but k rows per
  block ever moves.
* ``IvfIndex`` / ``topk_ivf`` — the scale path: a deterministic
  k-means-lite coarse quantizer (sampled training, fixed iterations);
  vectors are bucketed by nearest centroid; a query probes only the
  ``nprobe`` nearest buckets. Same per-batch matmul inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(col) -> np.ndarray:
    """Arrow list column (or tensor extension) → 2-D float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        col = col.storage.field(0) if pa.types.is_struct(col.storage.type) else col.storage
    arr = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return arr.reshape(n, -1) if n else arr.reshape(0, 0)


class TopKCosineStage:
    """Actor-pool stage: holds the normalized query matrix (broadcast
    handle resolved once in ``__init__``, reference load-once pattern
    SURVEY.md §2.3) and emits the per-block top-k."""

    def __init__(self, query_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        q = np.atleast_2d(np.asarray(q, dtype=np.float64))
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        self.q = (q / qn[:, None]).T  # (dim, nq)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        M = _matrix(batch[self.vec_col])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        cos = (M / norms[:, None]) @ self.q  # (n, nq); nq=1 for single query
        c = cos[:, 0]
        k = min(self.k, len(c))
        idx = np.argpartition(-c, k - 1)[:k]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[idx]
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "cos": pa.array(np.round(c[idx], 4), pa.float64()),
            }
        )


def topk_cosine(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """Exact cosine top-k. Ties broken by id ascending (deterministic,
    matching ``ORDER BY cos DESC, id`` in the oracle)."""
    qref = ray.put(np.asarray(query))
    partial = ds.map_batches(
        TopKCosineStage,
        fn_constructor_args=(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
    return partial.sort(["cos", id_col], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant — the 100 TB path
# ---------------------------------------------------------------------------


class IvfIndex:
    """Deterministic coarse quantizer: k-means with seeded sample init
    and a fixed iteration count (no RNG state leaks — same input, same
    centroids)."""

    def __init__(self, centroids: np.ndarray):
        c = np.asarray(centroids, dtype=np.float64)
        n = np.linalg.norm(c, axis=1)
        n[n == 0] = 1.0
        self.centroids = c / n[:, None]

    @staticmethod
    def train(
        ds: ray.data.Dataset,
        n_centroids: int = 16,
        sample_rows: int = 4096,
        iters: int = 5,
        vec_col: str = "embedding",
        seed: int = 42,
    ) -> "IvfIndex":
        # deterministic sample: first `sample_rows` rows (input order is
        # stable for a snapshot scan)
        rows = ds.limit(sample_rows).take_all()
        X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
        rng = np.random.default_rng(seed)
        init = rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)
        C = Xn[np.sort(init)].copy()
        for _ in range(iters):
            assign = np.argmax(Xn @ C.T, axis=1)
            for j in range(len(C)):
                m = assign == j
                if m.any():
                    v = Xn[m].mean(axis=0)
                    C[j] = v / max(np.linalg.norm(v), 1e-12)
        return IvfIndex(C)

    def assign_batch(self, batch: pa.Table, vec_col: str) -> np.ndarray:
        M = _matrix(batch[vec_col])
        norms = np.maximum(np.linalg.norm(M, axis=1), 1e-12)
        return np.argmax((M / norms[:, None]) @ self.centroids.T, axis=1)


def topk_ivf(
    ds: ray.data.Dataset,
    index: IvfIndex,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Probe only the nprobe nearest IVF buckets, then exact top-k
    within them. At table scale the bucket id is a persisted column and
    a zone-map prunable partition key; here it is computed on the fly."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = set(np.argsort(-(index.centroids @ qn))[:nprobe].tolist())
    idx_ref = ray.put(index.centroids)

    class ProbeFilter:
        def __init__(self):
            self.index = IvfIndex(ray.get(idx_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            a = self.index.assign_batch(batch, vec_col)
            return batch.filter(pa.array(np.isin(a, list(probes))))

    pruned = ds.map_batches(ProbeFilter, batch_format="pyarrow", concurrency=(1, 4))
    return topk_cosine(pruned, q, k=k, vec_col=vec_col, id_col=id_col)
