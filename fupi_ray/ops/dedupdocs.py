"""dedup_documents: near-duplicate document REMOVAL as a committing
table op.

The reference dedupes only at ingest and only exactly —
``drop_duplicates(subset=['text_id'])`` on the driver
(/root/reference/fupi/embedders.py:92). A training corpus needs the
stronger form as a *table maintenance* op: find near-duplicate
documents across the WHOLE table (MinHash over token k-grams + LSH
banding), resolve them into families, keep one canonical
representative per family (min doc_id) and delete the rest — in one
atomic commit, pinned to the snapshot the detection ran against.

Scale shape (the whole point):

1. **One scan** of ``(doc_id, tokens)`` → a per-doc signature table
   ``(id, sig)``: vectorized token k-gram mix-chain hashes → a (n, P)
   MinHash matrix (``functions/textkernels.py`` — the same kernels the
   text-side minhash query uses, fed token values instead of word
   hashes), stored as ONE ``fixed_size_binary(P*8)`` value per doc.
   This is the only pass that touches token bytes; the materialized
   signature table is P*8 bytes/doc (KBs per thousand docs), the
   working set of everything downstream.
2. **Banding runs on the signature table, not the corpus** — band keys
   are a pure function of the signature. Band rows carry only
   ``(id, band_key)`` (~40B), NOT the signature: measured 7×
   less exchange volume than shipping the signature with every band
   row, because each doc emits ``bands`` rows. One hash-bucket
   exchange groups identical band keys; per group, candidate (a<b)
   pairs are star-capped around the group minimum above ``max_group``
   so degenerate boilerplate stays output-linear
   (``stages/dedup._grouped_pairs`` — shared with the text pipeline).
3. **Candidate-bounded verify.** Distinct pairs are enriched with both
   sides' signatures (size-guarded broadcast-or-hash join against the
   small signature table; ``fixed_size_binary`` passes through Acero,
   unlike nested types) and kept when the unbiased MinHash estimate
   ``mean(sig_a == sig_b)`` ≥ ``threshold``. Work is O(candidates),
   never O(corpus).
4. **Families** via ``stages/dedup.resolve_duplicate_families``
   (driver union-find below 2M edges, distributed min-label
   propagation above — bounded exchanges, O(log diameter) rounds).
5. **Delete** the non-canonical members with ``merge_into(...,
   when_matched="delete", expected_parent=<scanned version>)`` — the
   tombstone feed carries ONLY doc_id keys, zone-map + bloom pruning
   touches only fragments that can hold a victim, and ``mode="dv"``
   writes O(deleted positions) bytes. The snapshot pin makes a
   concurrent commit fail this op loudly instead of deleting rows the
   detection never saw.

Exact duplicates are near-duplicates at Jaccard 1.0, so this op
subsumes exact content dedup; for boilerplate-heavy corpora run the
cheaper exact pass first (see ``stages/dedup.minhash_lsh_candidates``
COMPOSITION NOTE — measured 25 min → 16 s on a 200k-doc degenerate
corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fupi_ray.functions import textkernels as tk
from fupi_ray.functions.hashing import band_salts, mix64
from fupi_ray.ops.join import enrich_join
from fupi_ray.ops.merge import merge_into
from fupi_ray.schema import _unwrap_tensor
from fupi_ray.stages.dedup import (
    _grouped_pairs,
    dedup_pairs,
    filter_hot_keys,
    hot_band_keys,
    resolve_duplicate_families,
)
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _check_path(table_dir: str) -> str:
    return _fs.join(table_dir, "manifest", "dedupdocs_check.json")


def read_dedup_check(table: Table) -> dict | None:
    """Last completed dedup sweep: ``{checked_version, live_rows,
    threshold, checked_unix}`` — written on EVERY completion, including
    no-op sweeps, so ``maintain()`` can gate re-detection on table
    growth instead of re-scanning a clean corpus each cycle."""
    import json

    p = _check_path(table.table_dir)
    if not _fs.exists(p):
        return None
    return json.loads(_fs.read_text(p))


_CHECK_PATHS_CAP = 200_000


def _record_check(table: Table, version: int, live_rows: int, threshold: float):
    import json
    import time

    # the live path-hash SET at check time lets maintain() gate on
    # "rows in fragments that postdate the sweep" — the only measure
    # that survives a shrink-then-grow window (a net row count would
    # mask duplicate-heavy appends behind an earlier delete's deficit).
    # Capped: past ~200k fragments the record falls back to the count
    # gate rather than growing a multi-MB sidecar.
    path_hashes = None
    try:
        paths = [f.path for f in table.manifest(version).fragments]
        if len(paths) <= _CHECK_PATHS_CAP:
            from fupi_ray.functions.hashing import stable_hash

            path_hashes = (
                sorted(int(h) for h in stable_hash(np.array(paths, dtype=object)))
                if paths
                else []
            )
    except FileNotFoundError:
        pass  # expired concurrently: count-gate fallback
    _fs.write_text(
        _check_path(table.table_dir),
        json.dumps(
            {
                "checked_version": version,
                "live_rows": int(live_rows),
                "threshold": float(threshold),
                "checked_unix": time.time(),
                "path_hashes": path_hashes,
            }
        ),
    )


SIG_SUFFIX = ".sigs"


def sig_sidecar_path(parquet_abs_path: str) -> str:
    return parquet_abs_path + SIG_SUFFIX


@ray.remote(num_cpus=1)
def _fragment_sig_task(
    table_dir: str,
    rel_path: str,
    dv_rel: str | None,
    recon: dict,
    num_perm: int,
    gram: int,
    seed: int,
    id_type_str: str = "string",
    scheme: str = "oph",
) -> pa.Table:
    """(id, sig) rows for one fragment, DV-masked. Reuses the
    fragment's signature SIDECAR (``<fragment>.parquet.sigs``) when its
    parameters match; otherwise computes from the token bytes and
    persists the sidecar over the PHYSICAL row order — a later
    deletion vector masks the cached rows by position, exactly like
    the fragment itself. Fragments are content-addressed, so a sidecar
    can never describe stale content; it dies with its fragment
    (``ops/expire.py`` GC, same rule as bloom sidecars)."""
    from fupi_ray.ops.dv import apply_dv, masked_fragment_table, read_dv

    abs_path = _fs.join(table_dir, rel_path)
    side = sig_sidecar_path(abs_path)
    # scheme participates in the cache identity: an OPH sidecar must
    # never satisfy a classic request (or vice versa) — and pre-scheme
    # sidecars (no key) recompute once, then carry the key
    want = {
        "num_perm": str(num_perm),
        "gram": str(gram),
        "seed": str(seed),
        "scheme": scheme,
    }
    tbl = None
    try:
        if _fs.exists(side):
            cached = _fs.read_parquet_table(side)
            meta = {
                k.decode(): v.decode()
                for k, v in (cached.schema.metadata or {}).items()
            }
            if all(meta.get(k) == v for k, v in want.items()):
                tbl = cached.select(["id", "sig"])
    except (OSError, ValueError, KeyError):
        tbl = None  # unreadable/foreign sidecar → recompute
    if tbl is None:
        rmap = (recon or {}).get("rmap") or {}
        inv = {d: p for p, d in rmap.items()}
        phys_id = inv.get("doc_id", "doc_id")
        phys_tok = inv.get("tokens", "tokens")
        phys = masked_fragment_table(
            table_dir, rel_path, None, columns=[phys_id, phys_tok]
        )
        sigs = token_signatures(
            phys[phys_tok], _salts(num_perm, seed), gram, scheme=scheme
        )
        tbl = pa.table({"id": phys[phys_id], "sig": _sig_binary(sigs)})
        try:
            _fs.write_parquet(tbl.replace_schema_metadata(want), side)
        except OSError:
            pass  # a failed cache write must never fail the detection
    if dv_rel:
        tbl = apply_dv(tbl, read_dv(table_dir, dv_rel))
    # emit the DECLARED key type: a pre-widening fragment physically
    # stores the narrow type, and mixed-type blocks would corrupt the
    # band exchange and the MERGE-delete source (the full-scan path
    # casts per batch; the incremental path must match it exactly)
    from fupi_ray import manifest as _mf

    want_t = _mf.type_from_str(id_type_str)
    if tbl.schema.field("id").type != want_t:
        tbl = tbl.set_column(
            tbl.schema.get_field_index("id"), "id", pc.cast(tbl["id"], want_t)
        )
    return tbl


def _salts(num_perm: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=num_perm, dtype=np.int64).astype(np.uint64)


def token_signatures(
    tokens_col, salts: np.ndarray, gram: int, scheme: str = "oph"
) -> np.ndarray:
    """(n, P) uint64 MinHash matrix for a token list column: flat
    value mix → per-doc k-gram chain hashes → per-perm minima. All
    reduceat/broadcast kernels, no per-doc Python; computed in
    cache-sized doc slices (``textkernels.chunked_signatures``) so the
    multi-pass kernels stay memory-resident under full-box concurrency
    (measured 3.9s → 1.85s at 32 CPUs on the 4.8M-doc stage).

    ``scheme="oph"`` (default) uses one-permutation hashing with
    rotation densification (``textkernels.minhash_signatures_oph``) —
    ~P× less compute on the dominant signature pass with the same lane
    contract; ``"classic"`` keeps P independent permutations."""
    lst = _unwrap_tensor(tokens_col)
    offsets = np.asarray(lst.offsets, dtype=np.int64)
    vals = lst.values.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    # offsets are absolute into the (unsliced) child values buffer
    flat = vals[offsets[0] : offsets[-1]] if len(lengths) else vals[:0]
    W = mix64(flat.astype(np.uint64, copy=False) + _GOLDEN)
    fn = tk.minhash_signatures_oph if scheme == "oph" else tk.minhash_signatures
    return tk.chunked_signatures(W, lengths, salts, gram, fn)


def _sig_binary(sigs: np.ndarray) -> pa.Array:
    """(n, P) uint64 → one fixed_size_binary(P*8) value per row,
    zero-copy from the matrix buffer."""
    n, P = sigs.shape
    flat = np.ascontiguousarray(sigs).view(np.uint8).reshape(-1)
    return pa.Array.from_buffers(pa.binary(P * 8), n, [None, pa.py_buffer(flat)])


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """fixed_size_binary signature column → (n, P) uint64 matrix,
    zero-copy from the Arrow data buffer."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    raw = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
    start = arr.offset * num_perm
    return raw[start : start + len(arr) * num_perm].reshape(len(arr), num_perm)


def signature_dataset(
    corpus: ray.data.Dataset,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perm: int = 64,
    gram: int = 8,
    seed: int = 42,
    scheme: str = "oph",
) -> ray.data.Dataset:
    """One ``(id, sig fixed_size_binary(P*8))`` row per document — the
    only stage that reads token bytes."""
    salts = _salts(num_perm, seed)

    def to_sigs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], batch.schema.field(id_col).type),
                    "sig": pa.array([], pa.binary(num_perm * 8)),
                }
            )
        sigs = token_signatures(batch[tokens_col], salts, gram, scheme=scheme)
        return pa.table({"id": batch[id_col], "sig": _sig_binary(sigs)})

    return corpus.map_batches(to_sigs, batch_format="pyarrow")


def band_rows(
    sigs: ray.data.Dataset, num_perm: int, bands: int
) -> ray.data.Dataset:
    """(id, band_key) rows from the signature table — a pure function
    of the signature, so banding never re-reads the corpus and the LSH
    exchange ships ~24B+id/row instead of the signature. The band
    INDEX is folded into the key (one extra mix) rather than shipped
    as its own column: the key is already a collision-accepting 64-bit
    compression whose false groupings only ever ADD candidates (the
    estimator verify rejects them), so cross-band key collisions are
    the same, already-accepted error class — and the exchange drops an
    int32 column plus a second sort key on every row."""
    if num_perm % bands:
        raise ValueError("num_perm must be a multiple of bands")
    rpb = num_perm // bands
    band_salt = band_salts(bands)

    def to_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "id": pa.array([], batch.schema.field("id").type),
                    "band_key": pa.array([], pa.int64()),
                }
            )
        S = _sig_matrix(batch["sig"], num_perm).reshape(n, bands, rpb)
        key = S[:, :, 0]
        for r in range(1, rpb):
            key = mix64(key ^ S[:, :, r])
        key = mix64(key ^ band_salt[None, :])
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "id": batch["id"].take(take),
                "band_key": pa.array(key.reshape(-1).view(np.int64), pa.int64()),
            }
        )

    return sigs.map_batches(to_bands, batch_format="pyarrow")


def _band_keys_matrix(sig_tbl: pa.Table, num_perm: int, bands: int) -> np.ndarray:
    """Flat uint64 band-key array (n*bands) for one signature block —
    the same fold as :func:`band_rows` without materializing id
    repeats (the hot-key count needs only the keys)."""
    n = sig_tbl.num_rows
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    rpb = num_perm // bands
    S = _sig_matrix(sig_tbl["sig"], num_perm).reshape(n, bands, rpb)
    key = S[:, :, 0]
    for r in range(1, rpb):
        key = mix64(key ^ S[:, :, r])
    key = mix64(key ^ band_salts(bands)[None, :])
    return key.reshape(-1)


@ray.remote
def _split_sig_hot_keys(
    num_perm: int, bands: int, num_buckets: int, *sig_tbls: pa.Table
):
    """Map side of the detect hot-key push shuffle, fused over one or
    more SIGNATURE blocks: derive band keys in-task (no intermediate
    banded dataset, no id columns), np.unique, radix-partition into
    ``num_buckets`` per-bucket ``(sorted_keys, within_hot)`` objects.
    Multiple blocks per task bound the shuffle's object count
    (tasks × buckets) at high fragment counts. Must stay key-identical
    to ``band_rows`` + the generic ``stages.dedup._split_hot_keys``
    path: uniquing the CONCATENATED blocks only folds same-task
    duplicates into the within-hot array — the (count>=2 |
    seen-twice) rule is unchanged."""
    keys = np.concatenate(
        [_band_keys_matrix(t, num_perm, bands).view(np.int64) for t in sig_tbls]
    ) if sig_tbls else np.empty(0, np.int64)
    empty = np.empty(0, dtype=np.int64)
    if len(keys) == 0:
        return (
            tuple((empty, empty) for _ in range(num_buckets))
            if num_buckets > 1
            else (empty, empty)
        )
    u, c = np.unique(keys, return_counts=True)
    b = (mix64(u.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    ub, cb, bb = u[order], c[order], b[order]
    bounds = np.searchsorted(bb, np.arange(num_buckets + 1, dtype=np.int64))
    out = []
    for i in range(num_buckets):
        s, e = bounds[i], bounds[i + 1]
        seg = ub[s:e]
        out.append((seg, seg[cb[s:e] >= 2]))
    return tuple(out) if num_buckets > 1 else out[0]


def _hot_keys_fused(
    sigs: ray.data.Dataset,
    num_perm: int,
    bands: int,
    num_buckets: int,
    cap: int,
) -> np.ndarray | None:
    """Hot band keys straight off the materialized signature blocks —
    the fused twin of ``hot_band_keys(band_rows(sigs, ...))`` (same
    result set; one fewer full dataset pass). Block refs are batched
    so tasks × buckets stays under ``_SHUFFLE_OBJECT_BUDGET`` tiny
    objects — at 10^12-row fragment counts the per-bucket-object
    shuffle would otherwise drown the object store in metadata."""
    from fupi_ray.stages.dedup import _SHUFFLE_OBJECT_BUDGET, _reduce_hot_bucket

    refs = sigs.to_arrow_refs()
    if not refs:
        return np.array([], dtype=np.int64)
    per_task = max(1, -(-len(refs) * num_buckets // _SHUFFLE_OBJECT_BUDGET))
    groups = [refs[i : i + per_task] for i in range(0, len(refs), per_task)]
    split = _split_sig_hot_keys.options(num_returns=num_buckets)
    maps = [split.remote(num_perm, bands, num_buckets, *g) for g in groups]
    if num_buckets == 1:
        maps = [[m] for m in maps]
    reduces = [
        _reduce_hot_bucket.remote(*(maps[t][b] for t in range(len(maps))))
        for b in range(num_buckets)
    ]
    parts = ray.get(reduces)
    if sum(len(p) for p in parts) > cap:
        return None
    parts = [p for p in parts if len(p)]
    return np.sort(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)


def _verify_pairs(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    num_perm: int,
    threshold: float,
) -> ray.data.Dataset:
    """Candidate pairs → pairs whose MinHash-estimated Jaccard ≥
    ``threshold``. Two size-guarded enrichment joins against the
    signature table (O(candidates) work), then one vectorized lane
    compare."""
    sig_t = pa.binary(num_perm * 8)
    a = enrich_join(pairs, sigs, on="id_a", right_on="id", value_cols=["sig"])
    a = a.map_batches(
        lambda t: t.rename_columns(
            [("sig_a" if c == "sig" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    ab = enrich_join(a, sigs, on="id_b", right_on="id", value_cols=["sig"])

    def estimate(batch: pa.Table) -> pa.Table:
        out_names = ["id_a", "id_b", "est_jaccard"]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "est_jaccard": pa.array([], pa.float64()),
                }
            ).select(out_names)
        Sa = _sig_matrix(pc.cast(batch["sig_a"], sig_t), num_perm)
        Sb = _sig_matrix(pc.cast(batch["sig"], sig_t), num_perm)
        est = (Sa == Sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    return ab.map_batches(estimate, batch_format="pyarrow")


def dedup_documents(
    table: Table,
    num_perm: int = 64,
    bands: int = 16,
    gram: int = 8,
    threshold: float = 0.7,
    max_group: int = 64,
    num_buckets: int | None = None,
    mode: str = "dv",
    incremental: bool = False,
    job_id: str | None = None,
    scheme: str = "oph",
) -> dict:
    """Remove near-duplicate documents from ``table`` (keep the min
    ``doc_id`` of every duplicate family); returns metrics
    ``{version, rows_deleted, docs_in_families, families,
    pairs_verified}``. ``version`` is unchanged (no commit) when the
    table holds no near-duplicates.

    ``threshold`` is on the MinHash-estimated token-``gram``-Jaccard;
    ``mode`` is the MERGE-delete mode ("dv": O(deleted positions)
    sidecars, "cow": rewrite hit fragments). Detection runs against
    the version current at entry and the delete is PINNED to it — a
    concurrent commit fails the op (``CommitError``) rather than
    deleting rows the detection never saw; re-run to retry.

    ``incremental=True`` reads/writes per-fragment signature SIDECARS
    (bit-identical results): the first sweep computes and persists
    every fragment's signatures; later sweeps touch token bytes ONLY
    for fragments that appeared since (fragments are content-addressed
    and immutable, so a cached sidecar is always current). A repeated
    sweep over a grown table costs O(new fragments) token reads +
    O(all docs) signature bytes — the shape a periodic
    ``maintain()``-driven sweep needs at 100 TB.
    """
    parent = table.latest_version()
    m = table.manifest(parent)
    n_rows = sum(f.live_rows for f in m.fragments)
    empty = {
        "version": parent,
        "rows_deleted": 0,
        "docs_in_families": 0,
        "families": 0,
        "pairs_verified": 0,
    }
    if n_rows < 2:
        _record_check(table, parent, n_rows, threshold)
        return empty
    if num_buckets is None:
        # the band exchange moves bands rows/doc of (key 8B + id ~24B
        # + overhead); size buckets so one materialized bucket fits a
        # worker heap
        exch_bytes = n_rows * bands * 48
        num_buckets = int(max(64, -(-exch_bytes // (256 * 1024 * 1024))))

    if incremental:
        from fupi_ray.manifest import frag_recon

        id_type_str = str(table.schema(parent).field("doc_id").type)
        refs = [
            _fragment_sig_task.remote(
                table.table_dir,
                f.path,
                f.dv_path,
                frag_recon(f, m.column_ids),
                num_perm,
                gram,
                42,
                id_type_str,
                scheme,
            )
            for f in m.fragments
            if f.rows
        ]
        sigs = ray.data.from_arrow_refs(refs).materialize()
    else:
        sigs = signature_dataset(
            table.scan(parent, columns=["doc_id", "tokens"]),
            num_perm=num_perm,
            gram=gram,
            scheme=scheme,
        ).materialize()  # P*8 bytes/doc — the working set from here on
    # two-phase exchange (stages/dedup.hot_band_keys): band_rows is a
    # cheap pure function of the materialized signature table, so the
    # keys-only count pass and the filtered pair pass each re-derive it
    # rather than materializing 'bands' rows/doc. Only hot-key rows
    # (the only ones that can pair) ship ids through the exchange.
    from fupi_ray.stages.dedup import _HOT_KEY_CAP

    # hot-count reducer fan-out sized by KEY volume (8 B per (doc,
    # band) key), not the id-carrying pair-exchange volume: each
    # reducer holds its shard's keys in memory for one sort, so the
    # bucket count must keep that shard ~256 MB no matter the corpus
    # (10^12 rows × 16 bands → ~500k buckets, never a fixed 256)
    hot_buckets = int(max(64, -(-n_rows * bands * 8 // (256 * 1024 * 1024))))
    hot = _hot_keys_fused(
        sigs, num_perm, bands, num_buckets=hot_buckets, cap=_HOT_KEY_CAP
    )
    if hot is not None and len(hot) == 0:
        # no band key repeats anywhere: a clean corpus answers from the
        # keys-only pass alone, skipping both pair exchanges
        _record_check(table, parent, n_rows, threshold)
        return empty
    banded = band_rows(sigs, num_perm, bands)
    if hot is not None:
        banded = filter_hot_keys(banded, hot)
    cand = dedup_pairs(
        _grouped_pairs(
            banded,
            ["band_key"],
            max_group=max_group,
            num_buckets=num_buckets,
        )
    ).materialize()  # candidate-bounded; lets a clean corpus skip the
    if cand.count() == 0:  # verify joins entirely
        _record_check(table, parent, n_rows, threshold)
        return empty
    pairs = _verify_pairs(cand, sigs, num_perm, threshold).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        _record_check(table, parent, n_rows, threshold)
        return empty
    fams = resolve_duplicate_families(pairs).materialize()

    def victims(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["doc_id"], batch["family_id"])
        return batch.filter(keep).select(["doc_id"])

    drop = fams.map_batches(victims, batch_format="pyarrow").materialize()
    n_drop = drop.count()
    n_nodes = fams.count()
    n_fams = n_nodes - n_drop  # one canonical survivor per family
    if n_drop == 0:
        _record_check(table, parent, n_rows, threshold)
        return dict(
            empty, docs_in_families=n_nodes, families=n_fams, pairs_verified=n_pairs
        )
    version = merge_into(
        table,
        drop,
        job_id=job_id or f"dedupdocs-v{parent}",
        mode=mode,
        when_matched="delete",
        expected_parent=parent,
    )
    _record_check(table, version, n_rows - n_drop, threshold)
    return {
        "version": version,
        "rows_deleted": n_drop,
        "docs_in_families": n_nodes,
        "families": n_fams,
        "pairs_verified": n_pairs,
    }
