"""Per-fragment token blooms: a persisted needle-token index.

A training-corpus table keeps getting asked "which documents contain
token X?" — contamination motifs, PII markers, tracer/canary tokens,
special-token audits. The reference answers only by embedding search
(searcher.py:112-135); a full scan at 100 TB reads every token byte to
answer what is almost always "nowhere". This op gives each fragment a
bloom filter over its DISTINCT token values (``<fragment>.parquet
.tokbloom``), so a lookup touches only fragments that MAY contain all
(or any) of the probe tokens and verifies exactly inside those.

Same sidecar discipline as the doc_id blooms and the dedup signature
caches: fragments are immutable and content-addressed, so a sidecar is
valid forever, is built at most once (``ensure_token_blooms`` is
incremental — only fragments missing one pay the token read), and dies
with its fragment (``ops/expire.py`` GC). Deletion vectors only ever
SHRINK a fragment's row set, so a physical-rows bloom stays a sound
over-approximation; the in-fragment verify runs on the DV-masked scan.

Scale shape: the build is one token pass per NEW fragment (embarrassing
parallel remote tasks, no exchange); probes read F tiny sidecars in
chunked parallel tasks; the lookup scan reads only surviving fragments.
Selectivity honesty: for tokens common in the corpus every bloom says
"maybe" and the lookup degrades to a full scan + exact filter — the
index pays off for RARE tokens, which is the audit/decontamination use
case it exists for. (A posting-list inverted index would also serve
dense tokens but costs O(corpus) storage; blooms cost ~1 byte/distinct
token/fragment.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fupi_ray.functions import bloom as _bloom
from fupi_ray.functions.hashing import mix64
from fupi_ray.manifest import FragmentMeta
from fupi_ray.schema import _unwrap_tensor
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table

TOKBLOOM_SUFFIX = ".tokbloom"
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def tokbloom_path(parquet_abs_path: str) -> str:
    return parquet_abs_path + TOKBLOOM_SUFFIX


def _token_hashes(tokens: np.ndarray) -> np.ndarray:
    """uint64 probe/build hashes for raw token values — one shared
    definition so build and probe can never diverge."""
    return mix64(tokens.astype(np.uint64, copy=False) + _GOLDEN)


def _list_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, offsets-rebased-to-0) of a list column, chunk- and
    slice-safe."""
    lst = _unwrap_tensor(col)
    off = np.asarray(lst.offsets, dtype=np.int64)
    vals = lst.values.to_numpy(zero_copy_only=False)
    if off[0] != 0:
        vals = vals[off[0] : off[-1]]
        off = off - off[0]
    return vals, off


def _read_valid_tokbloom(parquet_abs_path: str) -> bytes | None:
    """Sidecar bytes, or None for absent/torn/foreign content — which
    always means "cannot prune / rebuild me", never an error (same
    contract as functions/bloom.py:read_sidecar)."""
    import struct

    p = tokbloom_path(parquet_abs_path)
    try:
        if not _fs.exists(p):
            return None
        blob = _fs.read_bytes(p)
        _bloom._parse(blob)  # validates magic + length
        return blob
    except (OSError, ValueError, struct.error):
        return None


@ray.remote(num_cpus=1)
def _stat_task(table_dir: str, rel_paths: list[str]) -> list[bool]:
    """Which fragments already hold a VALID sidecar (parallel: a
    driver-side loop would pay one serial stat round-trip per fragment
    on object stores)."""
    return [
        _read_valid_tokbloom(_fs.join(table_dir, rel)) is not None
        for rel in rel_paths
    ]


@ray.remote(num_cpus=1)
def _build_task(
    table_dir: str, rel_path: str, phys_tok: str, bits_per_key: int
) -> int:
    """Build one fragment's token bloom over its PHYSICAL rows (DVs
    only shrink the true set — over-approximation is the contract).
    Returns distinct-token count; crashes never corrupt (unique temp
    name is not needed: a torn overwrite of an idempotent value is
    re-written by the next ensure)."""
    abs_path = _fs.join(table_dir, rel_path)
    tbl = _fs.read_parquet_table(abs_path, columns=[phys_tok])
    vals, _ = _list_parts(tbl[phys_tok])
    distinct = np.unique(vals)
    blob = _bloom.build(_token_hashes(distinct), bits_per_key)
    _fs.write_bytes(tokbloom_path(abs_path), blob)
    return len(distinct)


def ensure_token_blooms(
    table: Table, version: int | None = None, bits_per_key: int = 10
) -> dict:
    """Build missing token blooms for every fragment of ``version``
    (default latest). Incremental: cached fragments cost one stat,
    batched through parallel tasks; a torn/corrupt sidecar counts as
    missing and is rebuilt (self-healing). Returns ``{"built",
    "cached"}``."""
    m = table.manifest(version)
    frags = [f for f in m.fragments if f.rows]
    CHUNK = 64
    chunks = [frags[i : i + CHUNK] for i in range(0, len(frags), CHUNK)]
    have = ray.get(
        [
            _stat_task.remote(table.table_dir, [f.path for f in ch])
            for ch in chunks
        ]
    )
    todo: list[FragmentMeta] = []
    cached = 0
    for ch, hs in zip(chunks, have):
        for f, h in zip(ch, hs):
            if h:
                cached += 1
            else:
                todo.append(f)
    refs = []
    for f in todo:
        phys = f.physical_name("tokens", m.column_ids) if f.col_ids else "tokens"
        if phys is None:
            continue  # pre-evolution fragment without the column
        refs.append(_build_task.remote(table.table_dir, f.path, phys, bits_per_key))
    if refs:
        ray.get(refs)
    return {"built": len(refs), "cached": cached}


@ray.remote(num_cpus=1)
def _probe_task(
    table_dir: str, rel_paths: list[str], hashes: np.ndarray, mode: str
) -> list[bool]:
    out = []
    for rel in rel_paths:
        blob = _read_valid_tokbloom(_fs.join(table_dir, rel))
        if blob is None:
            out.append(True)  # no/torn sidecar → cannot prune
            continue
        hits = _bloom.contains_mask(blob, hashes)
        out.append(bool(hits.all() if mode == "all" else hits.any()))
    return out


def keyword_lookup(
    table: Table,
    tokens: list[int],
    mode: str = "all",
    version: int | None = None,
    columns: list[str] | None = None,
    build: bool = True,
    bits_per_key: int = 10,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Documents whose token list contains ``all`` (or ``any``) of the
    probe ``tokens``, exact. Fragments whose bloom proves a miss are
    never opened; survivors are verified with a vectorized
    count-in-segment kernel on the DV-masked scan. ``build=True`` first
    fills in missing sidecars (pays one token pass per new fragment —
    the steady-state cost after appends)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    if not tokens:
        raise ValueError("keyword_lookup needs at least one probe token")
    version = table.latest_version() if version is None else version
    if build:
        ensure_token_blooms(table, version, bits_per_key)
    m = table.manifest(version)
    frags = [f for f in m.fragments if f.rows]
    probe = _token_hashes(np.asarray(sorted(set(tokens)), dtype=np.int64))
    keep: list[FragmentMeta] = []
    CHUNK = 64
    chunks = [frags[i : i + CHUNK] for i in range(0, len(frags), CHUNK)]
    votes = ray.get(
        [
            _probe_task.remote(table.table_dir, [f.path for f in ch], probe, mode)
            for ch in chunks
        ]
    )
    for ch, vs in zip(chunks, votes):
        keep.extend(f for f, v in zip(ch, vs) if v)
    if stats_out is not None:
        stats_out.update(
            {"fragments_total": len(frags), "fragments_scanned": len(keep)}
        )

    out_cols = columns if columns is not None else list(m.schema_names)
    read_cols = list(dict.fromkeys([*out_cols, "tokens"]))
    declared = {n: t for n, t in zip(m.schema_names, m.schema_types)}
    if not keep:
        from fupi_ray import manifest as _mf

        return ray.data.from_arrow(
            pa.table(
                {c: pa.array([], _mf.type_from_str(declared[c])) for c in out_cols}
            )
        )

    tok_vals = np.asarray(sorted(set(tokens)), dtype=np.int64)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(out_cols)
        vals, off = _list_parts(batch["tokens"])
        n = batch.num_rows
        mask = (
            np.ones(n, dtype=bool) if mode == "all" else np.zeros(n, dtype=bool)
        )
        csum = np.empty(len(vals) + 1, dtype=np.int64)
        for t in tok_vals:
            csum[0] = 0
            np.cumsum(vals == t, out=csum[1:])
            per_doc = csum[off[1:]] - csum[off[:-1]] > 0
            if mode == "all":
                mask &= per_doc
            else:
                mask |= per_doc
        return batch.filter(pa.array(mask)).select(out_cols)

    ds = table.scan_fragments(m, keep, columns=read_cols)
    return ds.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
