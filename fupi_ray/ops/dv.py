"""Deletion vectors: merge-on-read row deletes.

The COW mutations in ``ops/mutate.py`` rewrite every fragment that
contains a matching row — write amplification is O(fragment bytes)
even for a one-row delete. A deletion vector instead records the
DELETED ROW POSITIONS of a fragment in a tiny immutable sidecar and
leaves the Parquet file untouched; readers drop those positions at
scan time. This is the Iceberg v2 positional-delete / Delta deletion
-vector design, and it is the only delete shape that stays cheap at
100 TB: a delete touching k rows across F fragments writes O(k)
bytes + F sidecars, never O(fragment bytes).

The reference has no row-level deletes at all (tables are rebuilt via
``create_table(mode='overwrite')``, /root/reference/fupi/utils.py:39-49);
this module and ``ops/mutate.py`` are the two ends of the write-
amplification trade-off the lakehouse layer adds on top of it:

- COW (``delete_where``): read+rewrite hit fragments; scans stay plain
  Parquet reads. Right when deletes are wide (many rows per fragment).
- MOR (``delete_where_dv``): write a position sidecar; scans of DV'd
  fragments pay a mask. Right when deletes are narrow (point/GDPR
  deletes across a huge table).

Compaction (``ops/compact.py``) MATERIALIZES deletion vectors — a
DV'd fragment is always eligible for repacking, which drops the
masked rows and clears the DV — so the scan-side mask cost is
transient, bounded by the maintenance cadence.

Format: little-endian uint64 row positions, sorted ascending, behind
an 8-byte magic+count header; content-addressed file names (a new
delete writes a NEW sidecar holding the union and the manifest swap
points at it — old snapshots keep reading the old one; expiry GC's
unreferenced sidecars).

Scale shape: positions are per-fragment (a fragment is ≤ a few
hundred MB → positions fit trivially); masking is one numpy scatter +
one Arrow filter per fragment, vectorized; nothing driver-side.
"""

from __future__ import annotations

import uuid

import numpy as np
import pyarrow as pa

from fupi_ray.state import fs as _fs

_MAGIC = b"FUPIDV01"


def dv_rel_path(fragment_rel: str) -> str:
    """New content-addressed sidecar rel-path for a fragment.

    Lives in data/ beside the fragment, named after its stem so disk
    listings stay human-auditable; the uuid makes every DV version a
    distinct immutable file."""
    stem = fragment_rel.rsplit("/", 1)[-1]
    if stem.endswith(".parquet"):
        stem = stem[: -len(".parquet")]
    return f"data/{stem}.dv-{uuid.uuid4().hex[:12]}.bin"


def write_dv(table_dir: str, fragment_rel: str, positions: np.ndarray) -> str:
    """Write a deletion vector holding ``positions`` (deduped, sorted);
    returns its rel path."""
    pos = np.unique(positions.astype(np.uint64))
    rel = dv_rel_path(fragment_rel)
    payload = _MAGIC + np.uint64(len(pos)).tobytes() + pos.tobytes()
    _fs.write_bytes(_fs.join(table_dir, rel), payload)
    return rel


def read_dv(table_dir: str, dv_rel: str) -> np.ndarray:
    """Sorted uint64 deleted positions of one sidecar."""
    raw = _fs.read_bytes(_fs.join(table_dir, dv_rel))
    if raw[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"{dv_rel}: not a fupi deletion vector")
    n = int(np.frombuffer(raw, dtype=np.uint64, count=1, offset=len(_MAGIC))[0])
    return np.frombuffer(raw, dtype=np.uint64, count=n, offset=len(_MAGIC) + 8)


def live_mask(num_rows: int, positions: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for a fragment: True where the row survives."""
    mask = np.ones(num_rows, dtype=bool)
    if len(positions):
        mask[positions.astype(np.int64)] = False
    return mask


def apply_dv(tbl: pa.Table, positions: np.ndarray) -> pa.Table:
    """Drop deleted positions from a whole-fragment table."""
    if not len(positions):
        return tbl
    return tbl.filter(pa.array(live_mask(tbl.num_rows, positions)))


def masked_fragment_table(
    table_dir: str,
    fragment_rel: str,
    dv_rel: str | None,
    columns: list[str] | None = None,
) -> pa.Table:
    """Read one fragment with its deletion vector applied. Column
    pruning happens at the Parquet read; the positional mask is
    column-independent so it composes with any subset."""
    tbl = _fs.read_parquet_table(_fs.join(table_dir, fragment_rel), columns=columns)
    if dv_rel is None:
        return tbl
    return apply_dv(tbl, read_dv(table_dir, dv_rel))


def dv_fragments_dataset(
    table_dir: str,
    frags: list,
    columns: list[str] | None = None,
    manifest_ids: dict | None = None,
) -> "ray.data.Dataset":  # noqa: F821
    """Dataset over DV'd fragments: one read task per fragment (the
    fragment is the parallelism unit, same as the plain scan path),
    each applying its positional mask before emitting the block.
    Plain ``read_parquet`` cannot express this — predicate/column
    pushdown changes row positions, so the mask must be applied by a
    reader that sees whole files. With ``manifest_ids``, renamed
    columns are read under their file name and emitted under the
    declared name (``columns`` then names DECLARED columns)."""
    import ray.data

    from fupi_ray import manifest as _mf

    import json as _json

    items = []
    for f in frags:
        rmap = f.rename_map(manifest_ids) if manifest_ids else {}
        inv = {d: p for p, d in rmap.items()}
        cols = [inv.get(c, c) for c in columns] if columns is not None else None
        items.append(
            {
                "path": f.path,
                "dv": f.dv_path or "",
                "meta": _json.dumps({"cols": cols, "rmap": rmap}),
            }
        )

    def read(batch: pa.Table) -> pa.Table:
        out = []
        for p, d, meta_s in zip(
            batch["path"].to_pylist(),
            batch["dv"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            meta = _json.loads(meta_s)
            out.append(
                _mf.apply_rename(
                    masked_fragment_table(
                        table_dir, p, d or None, columns=meta["cols"]
                    ),
                    meta["rmap"],
                )
            )
        return out[0] if len(out) == 1 else pa.concat_tables(out, promote_options="default")

    return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        read, batch_format="pyarrow"
    )


def fragments_dataset(
    table_dir: str,
    frags: list,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    manifest_ids: dict | None = None,
) -> "ray.data.Dataset":  # noqa: F821
    """DV-aware raw fragment read for ops that bypass ``Table.scan``
    (merge shuffle, cluster sort): plain fragments go through
    ``read_parquet`` (one block per fragment, URI-safe), DV'd ones
    through the per-fragment masked reader; the union is the logical
    row set. No schema-evolution padding — callers that need it pad
    downstream (they already do for the plain path). ``manifest_ids``
    (the reading manifest's column ids) makes the read rename-aware:
    plain fragments are grouped by their rename signature, read under
    file names, and emitted under declared names."""
    import ray.data

    from fupi_ray import manifest as _mf

    plain = [f for f in frags if not f.dv_path]
    dvf = [f for f in frags if f.dv_path]
    parts = []
    # group plain fragments by rename signature: one read_parquet per
    # homogeneous group (almost always a single {} group)
    groups: dict[frozenset, list] = {}
    for f in plain:
        rmap = f.rename_map(manifest_ids) if manifest_ids else {}
        groups.setdefault(frozenset(rmap.items()), []).append(f)
    for sig, group in groups.items():
        rmap = dict(sig)
        inv = {d: p for p, d in rmap.items()}
        paths = [_fs.join(table_dir, f.path) for f in group]
        kwargs: dict = {"override_num_blocks": override_num_blocks or len(paths)}
        if columns is not None:
            kwargs["columns"] = [inv.get(c, c) for c in columns]
        paths, fs_kwargs = _fs.ray_read_paths(paths)
        ds = ray.data.read_parquet(paths, **kwargs, **fs_kwargs)
        if rmap:
            ds = ds.map_batches(
                lambda b, _r=rmap: _mf.apply_rename(b, _r),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        parts.append(ds)
    if dvf:
        parts.append(
            dv_fragments_dataset(
                table_dir, dvf, columns=columns, manifest_ids=manifest_ids
            )
        )
    if not parts:
        raise ValueError("fragments_dataset: empty fragment list")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
