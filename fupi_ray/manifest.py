"""Manifest + fragment metadata: the explicit version of what the
reference delegates to LanceDB.

Every LanceDB commit in the reference (`create_table(mode='overwrite')`
fupi/utils.py:39-49, `table.add` fupi/embedders.py:124-125,
`compact_files()` fupi/embedders.py:127-128) produces a new table
version over immutable fragments; readers scan a pinned snapshot
(searcher.py:404-405, 207-208). Here that contract is explicit:

    table_dir/
      data/<fragment>.parquet          immutable fragments
      manifest/v{N:08d}.json           one manifest per version
      manifest/_latest                 current version number (atomic rename)
      manifest/pins/<name>.json        named snapshot pins (ref counts)
      lineage/<job_id>/<partition>.json  per-partition resume checkpoints

A manifest lists fragments with zone maps (per-fragment min/max per
column) — the engine's stand-in for Lance's fragment stats — which
drive scan pruning, MERGE fragment selection and compaction planning.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# legacy fixed pruning set — kept as the column ORDER preference for
# shard aggregation and diagnostics; zone maps themselves now cover
# every zone-eligible column of the written schema (see zone_columns)
ZONE_MAP_COLUMNS = ("doc_id", "n_tok", "source", "bucket")

# string zone entries longer than this are omitted (conservative — the
# fragment is simply never pruned on that column; truncating a MAX
# bound safely needs Iceberg-style upper-bound bumping, not worth it)
_ZONE_STR_MAX = 64


def _zone_eligible(typ: pa.DataType) -> bool:
    """Cheap totally-ordered scalar types get automatic zone maps;
    nested/binary payloads (token lists, embeddings, media bytes)
    don't — their min/max is meaningless for pruning and huge."""
    # temporal types are excluded: their min/max would need a stable
    # JSON encoding through manifests/shards; the engine's timestamps
    # are integer epochs (events.ts_us), which zone-map natively
    return (
        pa.types.is_integer(typ)
        or pa.types.is_floating(typ)
        or pa.types.is_boolean(typ)
        or pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
    )


def zone_columns(schema: pa.Schema) -> list[str]:
    return [f.name for f in schema if _zone_eligible(f.type)]


def _zone_entry(mm_min, mm_max) -> dict | None:
    """Normalize a min/max pair into a zone entry, or None when the
    pair cannot prune safely (all-null column, NaN-poisoned floats,
    oversized strings)."""
    lo, hi = _scalar(mm_min), _scalar(mm_max)
    if lo is None or hi is None:
        return None
    if isinstance(lo, float) and (lo != lo or hi != hi):  # NaN
        return None
    if isinstance(lo, str) and (len(lo) > _ZONE_STR_MAX or len(hi) > _ZONE_STR_MAX):
        return None
    return {"min": lo, "max": hi}


@dataclass
class FragmentMeta:
    path: str  # relative to table_dir
    rows: int
    bytes: int
    sum_n_tok: int
    zone_map: dict[str, dict[str, Any]] = field(default_factory=dict)
    # physical column names of the file (schema evolution: lets scans
    # know which declared columns a pre-evolution fragment lacks
    # without a footer read); None for metas recorded before this field
    cols: list[str] | None = None
    # field ids of the physical columns at the commit that introduced
    # this fragment (name -> manifest column id). Iceberg-style: a
    # dropped-then-re-added column gets a NEW id, so scans don't
    # resurrect the stale physical values from pre-drop fragments.
    # None for metas recorded before this field (name-based fallback).
    col_ids: dict[str, int] | None = None
    # deletion vector (merge-on-read DELETE): sidecar of sorted row
    # positions logically deleted from this file. ``rows`` stays the
    # PHYSICAL file row count; readers drop the positions, so logical
    # rows = ``live_rows``. None = no deletes. Zone maps / blooms stay
    # conservative (they may still cover deleted rows).
    dv_path: str | None = None
    dv_rows: int = 0
    # sum of n_tok over DELETED rows (keeps total_tokens exact without
    # a rewrite); 0 when no DV or the file has no n_tok column
    dv_n_tok: int = 0
    # physical column types (name -> display form) at write time.
    # Exists for type widening: a fragment written before
    # ``widen_column`` keeps the NARROW physical type; scans cast it
    # to the declared type per batch. None = physical types match the
    # declared schema (the overwhelmingly common case — kept out of
    # the manifest so pre-widen manifests stay byte-identical).
    col_types: dict[str, str] | None = None
    # storage bucket id (hash(key) % num_buckets) when every row of
    # this file belongs to one bucket of a ``bucket_table`` layout —
    # the co-partitioning contract behind shuffle-free bucketed joins
    # (ops/bucket.py). None = not bucket-pure. Omitted from the
    # manifest when None so pre-bucket manifests stay byte-identical.
    bucket: int | None = None
    # layout identity of the tag: "key%num_buckets" (e.g. "doc_id%16").
    # The fragment is the source of truth — bucket_join validates that
    # every fragment on both sides carries the SAME signature, so a
    # rollback across a re-bucket, or a crash between the bucket commit
    # and its sidecar write, can never mix incompatible tags silently.
    bucket_sig: str | None = None
    # clustering identity: "curve@bits" (e.g. "zorder@21") when this
    # fragment was written by a cluster run under that layout and its
    # internal order has been preserved since. Incremental reclustering
    # (ops/cluster.py cluster(incremental=True)) re-sorts ONLY
    # fragments whose tag doesn't match — at 10^12-sequence scale a
    # full recluster after every append is a full-table rewrite; the
    # tag bounds it to the appended delta. Ops that repack or reorder
    # rows (compaction packs, COW rewrites) drop the tag
    # conservatively; omitted from the manifest when None so
    # pre-feature manifests stay byte-identical.
    cluster_sig: str | None = None

    def to_dict(self) -> dict:
        d = asdict(self)
        if self.dv_path is None:
            # keep pre-DV manifests byte-identical (and small)
            d.pop("dv_path"), d.pop("dv_rows"), d.pop("dv_n_tok")
        if self.col_types is None:
            d.pop("col_types")
        if self.bucket is None:
            d.pop("bucket")
        if self.bucket_sig is None:
            d.pop("bucket_sig")
        if self.cluster_sig is None:
            d.pop("cluster_sig")
        return d

    @staticmethod
    def from_dict(d: dict) -> "FragmentMeta":
        return FragmentMeta(
            path=d["path"],
            rows=int(d["rows"]),
            bytes=int(d["bytes"]),
            sum_n_tok=int(d.get("sum_n_tok", 0)),
            zone_map=d.get("zone_map", {}),
            cols=d.get("cols"),
            col_ids=d.get("col_ids"),
            dv_path=d.get("dv_path"),
            dv_rows=int(d.get("dv_rows", 0)),
            dv_n_tok=int(d.get("dv_n_tok", 0)),
            col_types=d.get("col_types"),
            bucket=d.get("bucket"),
            bucket_sig=d.get("bucket_sig"),
            cluster_sig=d.get("cluster_sig"),
        )

    @property
    def live_rows(self) -> int:
        return self.rows - self.dv_rows

    @property
    def live_n_tok(self) -> int:
        return self.sum_n_tok - self.dv_n_tok

    def has_column(self, name: str, manifest_ids: dict[str, int]) -> bool:
        """Does this fragment physically carry the CURRENT incarnation
        of declared column ``name``? Id-aware when both sides have ids;
        name-based for legacy metas; True (conservative: a footer read
        will settle it) when the meta predates the ``cols`` field."""
        return self.physical_name(name, manifest_ids) is not None

    def physical_name(self, name: str, manifest_ids: dict[str, int]) -> str | None:
        """The FILE column name carrying declared column ``name``, or
        None if the fragment physically lacks it. Usually ``name``
        itself; differs after ``rename_column`` (Iceberg-style: the
        field id survives the rename, so an old fragment serves the
        renamed column under its original file name until the fragment
        is next rewritten)."""
        if self.col_ids is not None and name in manifest_ids:
            want = manifest_ids[name]
            if self.col_ids.get(name) == want:
                return name
            for phys, fid in self.col_ids.items():
                if fid == want:
                    return phys
            return None
        if self.cols is not None:
            return name if name in self.cols else None
        return name  # legacy meta: conservative (footer read settles it)

    def rename_map(self, manifest_ids: dict[str, int]) -> dict[str, str]:
        """physical file name -> declared name, for every column whose
        field id survives under a different declared name; {} when
        nothing is renamed (the common case, checked cheaply)."""
        if not self.col_ids:
            return {}
        id_to_decl = {i: n for n, i in manifest_ids.items()}
        out = {}
        for phys, fid in self.col_ids.items():
            decl = id_to_decl.get(fid)
            if decl is not None and decl != phys:
                out[phys] = decl
        return out


@dataclass
class Manifest:
    version: int
    parent_version: int | None
    operation: str
    schema_names: list[str]
    schema_types: list[str]
    fragments: list[FragmentMeta]
    properties: dict[str, Any] = field(default_factory=dict)
    created_unix: float = 0.0
    # schema-evolution fill values: column -> scalar used when a
    # fragment written before the column existed is scanned
    column_defaults: dict[str, Any] = field(default_factory=dict)
    # Iceberg-style field ids: declared column name -> stable id.
    # A re-added name gets a fresh id (never reused), so fragments
    # written before the drop don't satisfy the new column by name.
    column_ids: dict[str, int] = field(default_factory=dict)
    next_column_id: int = 0
    # two-level manifests (set by the commit path for big tables):
    # the fragment list lives in immutable shard files under
    # manifest/shards/, and the manifest JSON stores only shard refs
    # ``{path, count, rows, bytes, sum_n_tok, zone_map, col_ids}`` —
    # an append rewrites O(new fragments) JSON, not O(table), and a
    # predicate scan prunes whole shards by their aggregate zone map
    # before loading a single member. None = inline fragments (small
    # tables; unchanged layout).
    fragment_shards: list[dict] | None = None

    @property
    def total_rows(self) -> int:
        # logical rows: physical minus deletion-vector rows
        return sum(f.live_rows for f in self.fragments)

    @property
    def total_bytes(self) -> int:
        return sum(f.bytes for f in self.fragments)

    @property
    def total_tokens(self) -> int:
        return sum(f.live_n_tok for f in self.fragments)

    def to_json(self) -> str:
        d = {
            "version": self.version,
            "parent_version": self.parent_version,
            "operation": self.operation,
            "schema_names": self.schema_names,
            "schema_types": self.schema_types,
            # sharded: members live in the (already written) shard
            # files; the manifest itself stays O(shards) bytes
            "fragments": []
            if self.fragment_shards is not None
            else [f.to_dict() for f in self.fragments],
            "properties": self.properties,
            "created_unix": self.created_unix,
            "column_defaults": self.column_defaults,
            "column_ids": self.column_ids,
            "next_column_id": self.next_column_id,
        }
        if self.fragment_shards is not None:
            d["fragment_shards"] = self.fragment_shards
        return json.dumps(d, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            version=d["version"],
            parent_version=d.get("parent_version"),
            operation=d.get("operation", "?"),
            schema_names=d.get("schema_names", []),
            schema_types=d.get("schema_types", []),
            fragments=[FragmentMeta.from_dict(f) for f in d["fragments"]],
            properties=d.get("properties", {}),
            created_unix=d.get("created_unix", 0.0),
            column_defaults=d.get("column_defaults", {}),
            column_ids=d.get("column_ids", {}),
            next_column_id=d.get("next_column_id", 0),
            fragment_shards=d.get("fragment_shards"),
        )


_PRIMITIVE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "halffloat": pa.float16(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
}


def type_from_str(s: str) -> pa.DataType:
    """Parse the ``str(pa.DataType)`` display form back into a type.

    Covers the engine's supported column types (primitives, timestamps,
    (large_/fixed_size_)lists of primitives). Manifest schemas are
    stored in this display form so they stay human-readable JSON.
    """
    s = s.strip()
    if s in _PRIMITIVE_TYPES:
        return _PRIMITIVE_TYPES[s]
    if s.startswith("timestamp["):
        inner = s[len("timestamp[") : -1]
        if "," in inner:
            unit, tz = inner.split(",", 1)
            return pa.timestamp(unit.strip(), tz=tz.split("=", 1)[-1].strip())
        return pa.timestamp(inner)
    import re as _re

    def strip_field_name(inner: str) -> str:
        # parquet round-trips list items under varying field names
        # ("item: int32", "element: int32") — the name is irrelevant
        return _re.sub(r"^\s*\w+:\s*", "", inner)

    for prefix, ctor in (("large_list<", pa.large_list), ("list<", pa.list_)):
        if s.startswith(prefix) and s.endswith(">"):
            return ctor(type_from_str(strip_field_name(s[len(prefix) : -1])))
    if s.startswith("fixed_size_list<") and s.endswith("]"):
        body, n = s[len("fixed_size_list<") :].rsplit(">[", 1)
        return pa.list_(
            type_from_str(strip_field_name(body)), int(n[:-1] if n.endswith("]") else n)
        )
    raise ValueError(f"unsupported schema type string {s!r}")


def schema_from_manifest(m: "Manifest") -> pa.Schema | None:
    """Declared arrow schema of a manifest, or None if absent/unparsable."""
    if not m.schema_names:
        return None
    try:
        return pa.schema(
            [(n, type_from_str(t)) for n, t in zip(m.schema_names, m.schema_types)]
        )
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Filesystem layout helpers. Local paths use plain os I/O (tmp-file +
# rename atomicity); any scheme:// table_dir routes through state/fs
# (fsspec) so the same layout lives on s3/gs/memory — SURVEY §2.1 S8.
# ---------------------------------------------------------------------------

from fupi_ray.state import fs as _fs


def manifest_dir(table_dir: str) -> str:
    return _fs.join(table_dir, "manifest")


def data_dir(table_dir: str) -> str:
    return _fs.join(table_dir, "data")


def lineage_dir(table_dir: str) -> str:
    return _fs.join(table_dir, "lineage")


def manifest_path(table_dir: str, version: int) -> str:
    return _fs.join(manifest_dir(table_dir), f"v{version:08d}.json")


def _atomic_write(path: str, content: str) -> None:
    """Write via temp file + rename so readers never see partial JSON;
    a scheme:// path becomes one whole-object put (atomic on object
    stores by definition)."""
    if _fs.is_uri(path):
        _fs.write_text(path, content)
        return
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_latest_version(table_dir: str) -> int | None:
    p = _fs.join(manifest_dir(table_dir), "_latest")
    if not _fs.exists(p):
        return None
    if _fs.is_uri(p):
        return int(_fs.read_text(p).strip())
    with open(p) as f:
        return int(f.read().strip())


def write_latest_version(table_dir: str, version: int) -> None:
    _atomic_write(_fs.join(manifest_dir(table_dir), "_latest"), str(version))


def _read_raw_manifest(table_dir: str, version: int) -> Manifest:
    """Parse one manifest WITHOUT resolving fragment shards."""
    p = manifest_path(table_dir, version)
    if _fs.is_uri(p):
        return Manifest.from_json(_fs.read_text(p))
    with open(p) as f:
        return Manifest.from_json(f.read())


def read_manifest(table_dir: str, version: int) -> Manifest:
    m = _read_raw_manifest(table_dir, version)
    if m.fragment_shards is not None:
        m.fragments = [
            f for ref in m.fragment_shards for f in load_shard(table_dir, ref["path"])
        ]
    return m


def read_manifest_header(table_dir: str, version: int) -> Manifest:
    """Manifest WITHOUT resolving fragment shards — metadata-only
    callers (time travel, WAP publish idempotency checks) must not pay
    a member-list load per version. ``fragments`` is empty for sharded
    manifests; never scan or commit from this object."""
    return _read_raw_manifest(table_dir, version)


def read_manifest_pruned(
    table_dir: str, version: int, predicate: list[tuple]
) -> Manifest:
    """Manifest with only the shards whose AGGREGATE zone map may
    contain a predicate match loaded — a scan-planning fast path that
    never reads the member lists of provably-empty shards. The result
    is PARTIAL (fragments restricted): scan-only, never commit from it.

    A shard ref's aggregate zone entry is trusted only for columns
    whose recorded field id still matches the reading manifest's
    (``ref['col_ids']``): after a drop + re-add the stale aggregate
    must not prune the new incarnation."""
    m = _read_raw_manifest(table_dir, version)
    if m.fragment_shards is None:
        return m  # inline manifest: fragments already parsed
    frags: list[FragmentMeta] = []
    for ref in m.fragment_shards:
        ref_ids = ref.get("col_ids", {})
        zone = {
            c: v
            for c, v in (ref.get("zone_map") or {}).items()
            if ref_ids.get(c) is not None and ref_ids.get(c) == m.column_ids.get(c)
        }
        agg = FragmentMeta(path=ref["path"], rows=0, bytes=0, sum_n_tok=0, zone_map=zone)
        if fragment_may_match(agg, predicate):
            frags.extend(load_shard(table_dir, ref["path"]))
    m.fragments = frags
    return m


# --- fragment-list shards ----------------------------------------------------
#
# Above SHARD_MIN_FRAGMENTS fragments, the commit path stores the
# fragment list as immutable shard files (SHARD_TARGET_FRAGMENTS
# members each) and the manifest keeps only shard refs: an append
# commit writes O(new fragments) metadata bytes instead of rewriting
# the full list (at 10^12 sequences / ~10^5-10^6 fragments a single
# inline JSON would be rewritten wholesale on every commit), and
# predicate scans drop whole shards by aggregate zone map. Shard files
# are content-immutable (uuid names): safe to cache per process and to
# share between manifest versions; unreferenced ones are GC'd by
# snapshot expiry alongside data fragments.

SHARD_MIN_FRAGMENTS = 512
SHARD_TARGET_FRAGMENTS = 1024

_SHARD_CACHE: dict[tuple[str, str], list[FragmentMeta]] = {}
_SHARD_CACHE_MAX = 4096


def shards_dir(table_dir: str) -> str:
    return _fs.join(manifest_dir(table_dir), "shards")


def load_shard(table_dir: str, rel_path: str) -> list[FragmentMeta]:
    key = (table_dir, rel_path)
    hit = _SHARD_CACHE.get(key)
    if hit is not None:
        return hit
    p = _fs.join(table_dir, rel_path)
    if _fs.is_uri(p):
        raw = _fs.read_text(p)
    else:
        with open(p) as f:
            raw = f.read()
    frags = [FragmentMeta.from_dict(d) for d in json.loads(raw)]
    if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
        _SHARD_CACHE.clear()  # immutable entries: dropping them only costs re-reads
    _SHARD_CACHE[key] = frags
    return frags


def _shard_ref(
    rel_path: str, members: list[FragmentMeta], column_ids: dict[str, int]
) -> dict:
    """Aggregate stats of one shard: per-column min/max over members
    that ALL carry the column's current incarnation (else the column
    is omitted → that shard is never pruned on it)."""
    zone: dict[str, dict[str, Any]] = {}
    ids: dict[str, int] = {}
    # aggregate every column ANY member zone-maps (zone maps cover all
    # zone-eligible columns now); the all-members requirement below
    # keeps the aggregate conservative
    agg_cols = sorted({c for f in members for c in f.zone_map})
    for col in agg_cols:
        if col not in column_ids:
            continue
        entries = []
        ok = True
        for f in members:
            zm = f.zone_map.get(col)
            if zm is None or zm["min"] is None or not f.has_column(col, column_ids):
                ok = False
                break
            entries.append(zm)
        if ok and entries:
            zone[col] = {
                "min": min(e["min"] for e in entries),
                "max": max(e["max"] for e in entries),
            }
            ids[col] = column_ids[col]
    return {
        "path": rel_path,
        "count": len(members),
        "rows": sum(f.rows for f in members),
        "bytes": sum(f.bytes for f in members),
        "sum_n_tok": sum(f.sum_n_tok for f in members),
        "zone_map": zone,
        "col_ids": ids,
    }


def write_shard(
    table_dir: str, members: list[FragmentMeta], column_ids: dict[str, int]
) -> dict:
    import uuid

    name = f"sh-{uuid.uuid4().hex}.json"
    rel = f"manifest/shards/{name}"
    _atomic_write(
        _fs.join(table_dir, rel),
        json.dumps([f.to_dict() for f in members], default=str),
    )
    _SHARD_CACHE[(table_dir, rel)] = list(members)
    return _shard_ref(rel, members, column_ids)


def plan_shards(table_dir: str, m: Manifest) -> None:
    """Assign ``m.fragment_shards`` before the manifest is committed.

    Small fragment lists stay inline (None). Big ones reuse every
    parent shard whose members appear UNCHANGED in the new list (meta
    equality, not just path — a backfilled field id must invalidate
    the shard) and pack the remainder into fresh shard files; the
    written JSON delta is proportional to what the commit changed."""
    if len(m.fragments) < SHARD_MIN_FRAGMENTS:
        m.fragment_shards = None
        return
    by_path = {f.path: f.to_dict() for f in m.fragments}
    kept_refs: list[dict] = []
    covered: set[str] = set()
    latest = read_latest_version(table_dir)
    if latest is not None:
        try:
            parent = read_manifest(table_dir, latest)
        except FileNotFoundError:
            parent = None
        if parent is not None and parent.fragment_shards:
            for ref in parent.fragment_shards:
                members = load_shard(table_dir, ref["path"])
                if any(f.path in covered for f in members):
                    continue
                if all(by_path.get(f.path) == f.to_dict() for f in members):
                    # field ids may have moved (drop/re-add): refresh
                    # the ref's aggregate against the NEW manifest ids
                    kept_refs.append(_shard_ref(ref["path"], members, m.column_ids))
                    covered.update(f.path for f in members)
    rest = [f for f in m.fragments if f.path not in covered]
    for i in range(0, len(rest), SHARD_TARGET_FRAGMENTS):
        chunk = rest[i : i + SHARD_TARGET_FRAGMENTS]
        kept_refs.append(write_shard(table_dir, chunk, m.column_ids))
    m.fragment_shards = kept_refs
    # canonical member order = shard order (scan plans and shard reuse
    # both become order-stable across commits)
    m.fragments = [
        f for ref in kept_refs for f in load_shard(table_dir, ref["path"])
    ]


def write_manifest(table_dir: str, m: Manifest) -> None:
    _atomic_write(manifest_path(table_dir, m.version), m.to_json())


def list_versions(table_dir: str) -> list[int]:
    md = manifest_dir(table_dir)
    out = []
    for name in _fs.ls_names(md):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


# --- pins ------------------------------------------------------------------


def pins_dir(table_dir: str) -> str:
    return _fs.join(manifest_dir(table_dir), "pins")


def read_pins(table_dir: str) -> dict[str, int]:
    pd_ = pins_dir(table_dir)
    pins: dict[str, int] = {}
    for name in _fs.ls_names(pd_):
        if name.endswith(".json"):
            p = _fs.join(pd_, name)
            d = json.loads(_fs.read_text(p) if _fs.is_uri(p) else open(p).read())
            pins[d["name"]] = int(d["version"])
    return pins


def write_pin(table_dir: str, name: str, version: int) -> None:
    _atomic_write(
        _fs.join(pins_dir(table_dir), f"{name}.json"),
        json.dumps({"name": name, "version": version, "created_unix": time.time()}),
    )


def remove_pin(table_dir: str, name: str) -> None:
    p = _fs.join(pins_dir(table_dir), f"{name}.json")
    if _fs.is_uri(p):
        _fs.rm(p)
    elif os.path.exists(p):
        os.unlink(p)


# ---------------------------------------------------------------------------
# Fragment metadata computation
# ---------------------------------------------------------------------------


def _scalar(v):
    if isinstance(v, (pa.Scalar,)):
        v = v.as_py()
    return v


def frag_recon(f: FragmentMeta, manifest_ids: dict) -> dict | None:
    """Per-fragment schema reconciliation for COW rewrite tasks: the
    rename map (file name -> declared name) and the physical-type
    stamp. None (no task-arg overhead) in the overwhelmingly common
    aligned case."""
    rmap = f.rename_map(manifest_ids)
    if not rmap and not f.col_types:
        return None
    return {"rmap": rmap, "col_types": f.col_types or {}}


def apply_rename(tbl: pa.Table, rmap: dict[str, str]) -> pa.Table:
    """Rename raw-read file columns to their declared names (zero-copy
    metadata operation). ``rmap`` comes from
    ``FragmentMeta.rename_map`` — {} short-circuits."""
    if not rmap:
        return tbl
    return tbl.rename_columns([rmap.get(n, n) for n in tbl.column_names])


def fragment_meta_from_table(
    tbl: pa.Table,
    path_abs: str,
    rel_path: str,
    col_types: dict[str, str] | None = None,
) -> FragmentMeta:
    """Compute fragment metadata from the in-memory table just written.

    Zone map = min/max of the pruning columns; ``sum_n_tok`` feeds
    bytes/token accounting for bin-packing and throughput metrics.
    ``col_types`` passes through the INPUT fragment's physical-type
    stamp when a rewrite copies narrow pre-widen data verbatim
    (merge/mutate COW tasks); filtered to columns actually written.
    """
    zone: dict[str, dict[str, Any]] = {}
    if tbl.num_rows:
        for col in zone_columns(tbl.schema):
            mm = pc.min_max(tbl.column(col))
            e = _zone_entry(mm["min"], mm["max"])
            if e is not None:
                zone[col] = e
    sum_n_tok = 0
    if "n_tok" in tbl.column_names and tbl.num_rows:
        sum_n_tok = int(pc.sum(tbl.column("n_tok")).as_py() or 0)
    kept_types = (
        {c: t for c, t in col_types.items() if c in tbl.column_names}
        if col_types
        else None
    )
    return FragmentMeta(
        path=rel_path,
        rows=tbl.num_rows,
        bytes=_fs.size(path_abs),
        sum_n_tok=sum_n_tok,
        zone_map=zone,
        cols=list(tbl.column_names),
        col_types=kept_types or None,
    )


def fragment_meta_from_footer(path_abs: str, rel_path: str) -> FragmentMeta:
    """Compute fragment metadata from the Parquet footer alone.

    Used for externally written files: min/max come from row-group
    statistics (no data read); only ``n_tok`` is read (one small int32
    column) for the token sum.
    """
    pf = pq.ParquetFile(path_abs)
    md = pf.metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    arrow_schema = pf.schema_arrow
    zone: dict[str, dict[str, Any]] = {}
    for col in zone_columns(arrow_schema):
        if col not in names:
            continue
        ci = names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                mins = []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            e = _zone_entry(pa.scalar(min(mins)), pa.scalar(max(maxs)))
            if e is not None:
                zone[col] = e
    sum_n_tok = 0
    if "n_tok" in names and md.num_rows:
        sum_n_tok = int(pc.sum(pf.read(columns=["n_tok"])["n_tok"]).as_py() or 0)
    return FragmentMeta(
        path=rel_path,
        rows=md.num_rows,
        bytes=_fs.size(path_abs),
        sum_n_tok=sum_n_tok,
        zone_map=zone,
        cols=list(names),
    )


# ---------------------------------------------------------------------------
# Zone-map pruning
# ---------------------------------------------------------------------------

_OPS = ("==", "!=", "<", "<=", ">", ">=", "between", "in")


import functools


@functools.lru_cache(maxsize=256)
def _bucket_targets(
    n: int, vals: tuple, col_kind: str
) -> frozenset | None:
    """Buckets the given point values can land in under the WRITER's
    hash path for a column of ``col_kind`` ('string' | 'int'), or None
    when the values can't be hashed down that exact path (type
    mismatch, overflow) — the caller then skips pruning. Cached per
    (n, values, kind): the set is per-scan, not per-fragment."""
    from fupi_ray.functions.hashing import stable_hash

    try:
        if col_kind == "string":
            if not all(isinstance(v, str) for v in vals):
                return None
            arr = np.array(vals, dtype=object)
        elif col_kind == "int":
            if not all(
                isinstance(v, (int, np.integer)) and not isinstance(v, bool)
                for v in vals
            ):
                return None
            arr = np.array(vals, dtype=np.uint64 if min(vals) >= 0 else np.int64)
        else:
            return None
        return frozenset((stable_hash(arr) % np.uint64(n)).tolist())
    except (OverflowError, ValueError):
        return None  # un-hashable input: no prune, never a crash


def fragment_bucket_may_match(frag: FragmentMeta, predicate: list[tuple]) -> bool:
    """Exact hash pruning on bucket-tagged fragments: a point conjunct
    (``==`` / ``in``) on the layout key can only match fragments whose
    tag equals ``stable_hash(value) % n`` — on a bucketed table this
    skips (n-1)/n of the fragments BEFORE zone maps or blooms are even
    consulted, with zero I/O.

    Conservative on two axes: the hash path is selected by the COLUMN's
    kind, inferred from the fragment's own zone entry for the key (the
    writer hashed the column, so an int predicate against a float
    column must NOT prune — 5 == 5.0 for the row filter but their
    hashes differ), and anything un-inferable or un-hashable passes
    through unpruned."""
    if frag.bucket is None or not frag.bucket_sig:
        return True
    key, _, n_s = frag.bucket_sig.rpartition("%")
    try:
        n = int(n_s)
    except ValueError:
        return True
    zm = frag.zone_map.get(key)
    lo = zm.get("min") if zm else None
    if isinstance(lo, str):
        col_kind = "string"
    elif isinstance(lo, (int, np.integer)) and not isinstance(lo, bool):
        col_kind = "int"
    else:
        return True  # column kind unknown (no zone entry / float / bool)

    for col, op, val in predicate:
        if col != key:
            continue
        if op in ("=", "=="):
            vals = (val,)
        elif op == "in":
            vals = tuple(val)
        else:
            continue
        if not vals:
            return False  # IN () matches nothing
        try:
            targets = _bucket_targets(n, vals, col_kind)
        except TypeError:
            continue  # unhashable value in the cache key: no prune
        if targets is not None and int(frag.bucket) not in targets:
            return False
    return True


def fragment_may_match(frag: FragmentMeta, predicate: list[tuple]) -> bool:
    """Conservative zone-map check: False only if the fragment provably
    contains no matching row. ``predicate`` is a conjunction of
    ``(col, op, value)`` triples (value = (lo, hi) for 'between',
    list for 'in')."""
    known = {"=", "==", "!=", "<", "<=", ">", ">=", "between", "in"}
    for col, op, val in predicate:
        if op not in known:
            raise ValueError(f"unknown predicate op {op!r}")
        if op == "=":
            op = "=="
        zm = frag.zone_map.get(col)
        if zm is None:
            continue  # no stats → cannot prune
        lo, hi = zm["min"], zm["max"]
        if lo is None or hi is None:
            continue
        if op == "==" and not (lo <= val <= hi):
            return False
        if op == "<" and not (lo < val):
            return False
        if op == "<=" and not (lo <= val):
            return False
        if op == ">" and not (hi > val):
            return False
        if op == ">=" and not (hi >= val):
            return False
        if op == "between":
            vlo, vhi = val
            if hi < vlo or lo > vhi:
                return False
        if op == "in" and not any(lo <= v <= hi for v in val):
            return False
        # "!=" can never prune via min/max unless lo == hi == val
        if op == "!=" and lo == hi == val:
            return False
    return True


def predicate_mask(batch: pa.Table, predicate: list[tuple]) -> pa.Array:
    """Evaluate the predicate conjunction on an in-memory batch (used
    when schema evolution prevents parquet-level pushdown: a padded
    column does not exist in the file). Null comparisons are False."""
    mask = None
    for col, op, val in predicate:
        c = batch[col]
        if op in ("=", "=="):
            e = pc.equal(c, val)
        elif op == "!=":
            e = pc.not_equal(c, val)
        elif op == "<":
            e = pc.less(c, val)
        elif op == "<=":
            e = pc.less_equal(c, val)
        elif op == ">":
            e = pc.greater(c, val)
        elif op == ">=":
            e = pc.greater_equal(c, val)
        elif op == "between":
            e = pc.and_(pc.greater_equal(c, val[0]), pc.less_equal(c, val[1]))
        elif op == "in":
            e = pc.is_in(c, value_set=pa.array(list(val)))
        else:
            raise ValueError(f"unknown predicate op {op!r}")
        mask = e if mask is None else pc.and_(mask, e)
    if mask is None:
        return pa.array(np.ones(batch.num_rows, dtype=bool))
    return pc.fill_null(mask, False)


def predicate_to_arrow(predicate: list[tuple]):
    """Translate the same conjunction into a pyarrow dataset expression
    for row-level pushdown inside ``read_parquet``."""
    import pyarrow.dataset as pads

    expr = None
    for col, op, val in predicate:
        f = pads.field(col)
        if op in ("=", "=="):
            e = f == val
        elif op == "!=":
            e = f != val
        elif op == "<":
            e = f < val
        elif op == "<=":
            e = f <= val
        elif op == ">":
            e = f > val
        elif op == ">=":
            e = f >= val
        elif op == "between":
            e = (f >= val[0]) & (f <= val[1])
        elif op == "in":
            e = f.isin(list(val))
        else:
            raise ValueError(f"unknown predicate op {op!r}")
        expr = e if expr is None else (expr & e)
    return expr
