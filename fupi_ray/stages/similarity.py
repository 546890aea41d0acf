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
        id_col: str | None = None,
        seed: int = 42,
    ) -> "IvfIndex":
        # deterministic STRATIFIED sample: keep rows whose hashed id
        # falls under sample_rows/n of the hash space — spread across
        # the whole table, not the first block (first-N would train the
        # quantizer on whatever shard happens to be first)
        if id_col is not None:
            from fupi_ray.functions.hashing import mix64, stable_hash

            n_total = max(ds.count(), 1)
            rate = min(1.0, 2.0 * sample_rows / n_total)
            threshold = np.uint64(min(int(rate * float(2**64 - 1)), 2**64 - 1))

            def pick(t: pa.Table) -> pa.Table:
                h = mix64(stable_hash(t[id_col]))
                return t.filter(pa.array(h <= threshold))

            rows = ds.map_batches(pick, batch_format="pyarrow").limit(sample_rows).take_all()
        else:
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


class FeatureHashEmbedder:
    """Stateful text→vector stage: deterministic feature-hashing
    embedding (char 3-gram hashes → signed counts in ``dim`` buckets,
    L2-normalized). The honest stand-in for the reference's ONNX
    embedding stage (fupi/embedders.py:35-63 — load once per worker,
    batch encode): feature hashing is a real technique, not a fake
    kernel, and it is deterministic across workers.

    Fully batched: one rolling-hash pass over the concatenated byte
    buffer (functions/textkernels machinery), one ``np.add.at``
    scatter per batch — no per-document Python."""

    def __init__(
        self,
        text_col: str = "text",
        dim: int = 64,
        k: int = 3,
        base: int = 257,
        model_path: str | None = None,
    ):
        """``model_path``: probe for onnxruntime ONCE per actor and
        build an ``InferenceSession`` when both the package and the
        model file are present (the reference's load-once contract,
        fupi/embedders.py:35-63 / fupi/utils.py:83-105). Without the
        runtime, single-MatMul models run through the pure-numpy
        executor (``stages/onnx_mini.py`` — same session API, known
        output) so the real code path still executes; anything the
        mini executor can't represent falls back to the deterministic
        feature-hashing kernel."""
        self.text_col, self.dim, self.k = text_col, dim, k
        self.session = None
        if model_path is not None:
            try:
                import onnxruntime  # not in this container

                self.session = onnxruntime.InferenceSession(model_path)
            except ImportError:
                from fupi_ray.stages.onnx_mini import MiniSession, UnsupportedOnnx

                try:
                    self.session = MiniSession(model_path)
                except (UnsupportedOnnx, OSError):
                    pass
        self.pows = np.array(
            [pow(base, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        lower = pc.utf8_lower(pc.fill_null(col, ""))
        if isinstance(lower, pa.ChunkedArray):
            lower = lower.combine_chunks()
        n = batch.num_rows
        from fupi_ray.functions.textkernels import string_byte_view

        offsets, data = string_byte_view(lower)
        codes = data[offsets[0] : offsets[-1]].astype(np.uint64)
        lengths = np.diff(offsets)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        M = np.zeros((n, self.dim), dtype=np.float64)
        L = len(codes)
        if L >= self.k:
            m = L - self.k + 1
            with np.errstate(over="ignore"):
                acc = np.zeros(m, dtype=np.uint64)
                for j in range(self.k):
                    acc += codes[j : j + m] * self.pows[j]
            valid = doc_of[:m] == doc_of[self.k - 1 : self.k - 1 + m]
            vdoc = doc_of[:m][valid]
            vh = acc[valid]
            bucket = (vh % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((vh >> np.uint64(63)) > 0, -1.0, 1.0)
            np.add.at(M.reshape(-1), vdoc * self.dim + bucket, sign)
        if self.session is not None:
            # real backend: the hashed count matrix is the model input
            # (featurize → project → normalize), batched through ORT in
            # one call — the reference's batch-encode contract
            # (fupi/embedders.py:52-63)
            (M,) = self.session.run(None, {"feats": M.astype(np.float32)})
            M = M.astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        M /= norms[:, None]
        vec = pa.FixedSizeListArray.from_arrays(pa.array(M.reshape(-1)), self.dim)
        return batch.append_column("vec", vec)


# ---------------------------------------------------------------------------
# Persisted IVF index: bucket column as a table artifact, probes prune
# via zone maps — the reference's stored-index search
# (``table.search(vec).limit(10)``, fupi/utils.py:149-161) re-expressed
# as lakehouse layout + metadata pruning.
# ---------------------------------------------------------------------------


def _index_path(table_dir: str) -> str:
    from fupi_ray.state import fs as _fs

    return _fs.join(table_dir, "index", "ivf.json")


def _make_assign(idx_ref, vec_col: str):
    """Actor-pool bucket assignment: centroids read from the object
    store ONCE per actor (broadcast, never re-shipped per batch)."""

    class Assign:
        def __init__(self):
            self.index = IvfIndex(ray.get(idx_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("bucket", pa.array([], pa.int32()))
            a = self.index.assign_batch(batch, vec_col).astype(np.int32)
            return batch.append_column("bucket", pa.array(a))

    return Assign


def _write_sidecar(table_dir: str, centroids: np.ndarray, version: int) -> None:
    import json

    from fupi_ray.state import fs as _fs

    # write_text routes any path (local or scheme://) through fsspec
    # and creates the parent directory itself.
    _fs.write_text(
        _index_path(table_dir),
        json.dumps({"centroids": centroids.tolist(), "table_version": int(version)}),
    )


def build_ivf_table(
    ds: ray.data.Dataset,
    table_dir: str,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    config=None,
):
    """Persist an IVF-bucketed copy of ``ds`` as a fupi_ray Table.

    - trains the coarse quantizer on a stratified sample,
    - assigns every row its ``bucket`` (actor pool, centroids broadcast
      once),
    - writes ONE fragment per bucket (the bucket groupby task writes
      its own fragment), so the ``bucket`` zone map makes an
      ``nprobe``-bucket query scan exactly ``nprobe`` fragments,
    - stores the centroid matrix as ``index/ivf.json`` next to the
      manifests (versioned with the table, tiny).

    Returns ``(Table, IvfIndex)``.
    """
    import json
    import os

    from fupi_ray.table import Table, _FragmentWriter

    index = IvfIndex.train(
        ds, n_centroids=n_centroids, sample_rows=sample_rows, vec_col=vec_col, id_col=id_col
    )
    idx_ref = ray.put(index.centroids)
    bucketed = ds.map_batches(
        _make_assign(idx_ref, vec_col), batch_format="pyarrow", concurrency=(1, 8)
    )

    t = Table.create(table_dir, config=config)
    writer = _FragmentWriter(table_dir, "ivf")

    def write_group(g: pa.Table) -> pa.Table:
        return writer(g)

    meta_rows = (
        bucketed.groupby("bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    from fupi_ray.manifest import FragmentMeta

    version = t.commit_fragment_swap(set(), frags := [
        FragmentMeta.from_dict(json.loads(r["meta_json"])) for r in meta_rows
    ], operation="ivf-build", properties={
        "n_centroids": int(len(index.centroids)),
        # the manifest references its index artifact so maintenance ops
        # (and readers) can tell whether the sidecar is current
        "ivf_index": {"path": "index/ivf.json"},
    })
    # table_version pins the snapshot whose bucket layout the centroid
    # sidecar describes; any commit NOT made through ivf_append
    # (merge, compact, overwrite) invalidates it (fupi delegates this
    # to Lance's versioned index storage, fupi/utils.py:149-161 — here
    # the sidecar carries its own version stamp)
    _write_sidecar(table_dir, index.centroids, version)
    return t, index


def ivf_append(
    table,
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Index MAINTENANCE under ingestion: append new vectors to a
    persisted IVF table WITHOUT retraining or rebuilding.

    New rows are bucket-assigned with the EXISTING centroids (actor
    pool, centroids broadcast once), grouped, and written one fragment
    per touched bucket; the commit then advances the sidecar's version
    stamp, so the staleness gate (``topk_ivf_persisted``) stays closed
    through ingestion — the lakehouse equivalent of Lance keeping its
    ANN index valid across ``table.add`` (fupi/embedders.py:124-125,
    fupi/utils.py:149-161). An nprobe query afterwards scans
    base + delta fragments of exactly the probed buckets (zone maps
    carry per-fragment bucket ranges).

    Contract: ``ds`` carries NEW ids only (an id upsert needs
    ``merge_into``, which rewrites fragments and correctly re-opens the
    staleness gate until the next ``build_ivf_table``). Recall for the
    appended rows equals assignment quality under the frozen
    centroids; retrain (rebuild) when drift accumulates.
    """
    import json

    from fupi_ray.manifest import FragmentMeta
    from fupi_ray.table import _FragmentWriter

    index, built_at = load_ivf_index(table.table_dir)
    current = table.latest_version()
    if built_at is not None and current != built_at:
        raise StaleIvfIndexError(
            f"IVF sidecar is at table version {built_at} but the table is at "
            f"{current}: a non-IVF commit intervened — rebuild with "
            "build_ivf_table() before appending"
        )
    idx_ref = ray.put(index.centroids)
    bucketed = ds.map_batches(
        _make_assign(idx_ref, vec_col), batch_format="pyarrow", concurrency=(1, 8)
    )
    writer = _FragmentWriter(table.table_dir, "ivfd")

    def write_group(g: pa.Table) -> pa.Table:
        return writer(g)

    meta_rows = (
        bucketed.groupby("bucket").map_groups(write_group, batch_format="pyarrow").take_all()
    )
    frags = [FragmentMeta.from_dict(json.loads(r["meta_json"])) for r in meta_rows]
    version = table.commit_fragment_swap(
        set(),
        frags,
        operation="ivf-append",
        properties={
            "n_centroids": int(len(index.centroids)),
            "ivf_index": {"path": "index/ivf.json"},
        },
    )
    _write_sidecar(table.table_dir, index.centroids, version)
    return version


class StaleIvfIndexError(RuntimeError):
    """The persisted IVF sidecar was built against an older table
    version: a commit since then (merge/compact/overwrite) may have
    changed the bucket layout, so probing with the stale centroids
    could silently miss rows. Rebuild with ``build_ivf_table``."""


def load_ivf_index(table_dir: str) -> tuple[IvfIndex, int | None]:
    import json

    from fupi_ray.state import fs as _fs

    d = json.loads(_fs.read_text(_index_path(table_dir)))
    idx = IvfIndex(np.asarray(d["centroids"], dtype=np.float64))
    v = d.get("table_version")
    return idx, (int(v) if v is not None else None)


def topk_ivf_persisted(
    table,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allow_stale: bool = False,
) -> ray.data.Dataset:
    """Query a persisted IVF table: pick the ``nprobe`` nearest buckets
    from the stored centroids, scan ONLY their fragments (zone-map
    prune on the ``bucket`` column — no full-table pass, unlike the
    ephemeral ``topk_ivf``), then exact top-k inside them.

    Staleness gate: the sidecar records the table version it was built
    at; if the table has committed past it the query REFUSES
    (``StaleIvfIndexError``) rather than silently probing a layout the
    centroids no longer describe — pass ``allow_stale=True`` only for
    diagnostics."""
    index, built_at = load_ivf_index(table.table_dir)
    current = table.latest_version()
    if not allow_stale and built_at is not None and current != built_at:
        raise StaleIvfIndexError(
            f"IVF index built at table version {built_at}, table is now at "
            f"{current}; rebuild with build_ivf_table() or pass allow_stale=True"
        )
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(b) for b in np.argsort(-(index.centroids @ qn))[:nprobe]]
    ds = table.scan(predicate=[("bucket", "in", probes)])
    return topk_cosine(ds, q, k=k, vec_col=vec_col, id_col=id_col)


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
