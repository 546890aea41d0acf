"""Table: versioned Parquet fragments + manifest, scanned as Ray Datasets.

Re-implements the observable contract of the reference's LanceDB table
lifecycle (SURVEY.md §1.2): ``create`` / ``commit_overwrite``
(fupi/utils.py:39-49), ``commit_append`` (fupi/embedders.py:124-125),
snapshot-pinned ``scan`` (searcher.py:404-405, 207-208). Compaction,
clustering, expiry and MERGE live in :mod:`fupi_ray.ops`.
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Sequence

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from fupi_ray import manifest as mf
from fupi_ray.config import DEFAULT_CONFIG, EngineConfig
from fupi_ray.manifest import FragmentMeta, Manifest
from fupi_ray.schema import SEQUENCES_SCHEMA
from fupi_ray.state import commit as commit_mod
from fupi_ray.state import fs as _fs


class SnapshotPinnedError(RuntimeError):
    pass


def _schema_lists(schema: pa.Schema) -> tuple[list[str], list[str]]:
    return list(schema.names), [str(t) for t in schema.types]


class _FragmentWriter:
    """map_batches callable: writes one fragment per input block and
    emits a one-row metadata record. Runs as stateless tasks — each
    block becomes one immutable Parquet fragment with a fresh unique
    name, so retried tasks can never corrupt committed state (commit
    happens only via the manifest)."""

    def __init__(
        self,
        table_dir: str,
        prefix: str,
        row_group_rows: int = 32 * 1024,
        bloom_bits: int | None = None,
    ):
        self.table_dir = table_dir
        self.prefix = prefix
        self.row_group_rows = row_group_rows
        self.bloom_bits = bloom_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"meta_json": pa.array([], type=pa.string())})
        name = f"{self.prefix}-{uuid.uuid4().hex}.parquet"
        rel = "data/" + name
        abs_path = _fs.join(self.table_dir, rel)
        if _fs.is_uri(abs_path):
            with _fs.open_write(abs_path) as f:
                pq.write_table(batch, f, row_group_size=self.row_group_rows)
        else:
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            pq.write_table(batch, abs_path, row_group_size=self.row_group_rows)
        if self.bloom_bits and "doc_id" in batch.column_names:
            from fupi_ray.functions import bloom as _bloom

            _bloom.write_sidecar(abs_path, batch["doc_id"], self.bloom_bits)
        meta = mf.fragment_meta_from_table(batch, abs_path, rel)
        import json

        return pa.table({"meta_json": pa.array([json.dumps(meta.to_dict(), default=str)])})


def write_dataset_fragments(
    ds: ray.data.Dataset,
    table_dir: str,
    prefix: str,
    *,
    target_fragment_rows: int | None = None,
    bloom_bits: int | None = None,
    row_group_rows: int = 32 * 1024,
) -> list[FragmentMeta]:
    """Write a Dataset out as fragments; return their metadata.

    One fragment per block (blocks are bounded by
    ``DataContext.target_max_block_size``, so fragments are too). The
    metadata stream is tiny (1 row per fragment) → safe to take_all.
    ``bloom_bits`` (bits/key, None = off) writes a doc_id bloom sidecar
    beside each fragment for point-lookup fragment pruning.
    ``row_group_rows`` sets the Parquet row-group size — the unit of
    in-fragment predicate pruning (``Table.row_group_prune_stats``).
    """
    import json

    writer = _FragmentWriter(
        table_dir, prefix, row_group_rows=row_group_rows, bloom_bits=bloom_bits
    )
    meta_ds = ds.map_batches(
        writer,
        batch_format="pyarrow",
        batch_size=target_fragment_rows,  # None → one batch per block
        zero_copy_batch=True,
    )
    rows = meta_ds.take_all()
    return [FragmentMeta.from_dict(json.loads(r["meta_json"])) for r in rows]


class Table:
    """A versioned Parquet table with explicit manifests."""

    def __init__(self, table_dir: str, config: EngineConfig | None = None):
        # absolutize local dirs up front: worker tasks and the DETACHED
        # commit actor run with their own cwd, so a relative table_dir
        # would scatter manifests/fragments across process working
        # directories (and a fork manifest would record dangling
        # relative references)
        if not _fs.is_uri(table_dir):
            table_dir = os.path.abspath(table_dir)
        self.table_dir = table_dir
        self.config = config or DEFAULT_CONFIG

    # -- lifecycle ----------------------------------------------------------

    @staticmethod
    def create(
        table_dir: str,
        schema: pa.Schema = SEQUENCES_SCHEMA,
        config: EngineConfig | None = None,
    ) -> "Table":
        """Create an empty table (manifest v0, no fragments)."""
        if not _fs.is_uri(table_dir):
            # same normalization __init__ applies: the commit actor and
            # worker tasks have their own cwd
            table_dir = os.path.abspath(table_dir)
        # URI-safe: os.makedirs on a scheme:// path would create a
        # literal "file:" directory relative to the cwd.
        _fs.makedirs(mf.data_dir(table_dir))
        names, types = _schema_lists(schema)
        if mf.read_latest_version(table_dir) is None:
            m = Manifest(
                version=0,
                parent_version=None,
                operation="create",
                schema_names=names,
                schema_types=types,
                fragments=[],
            )
            commit_mod.commit(table_dir, m, expected_parent=None)
        return Table(table_dir, config)

    @staticmethod
    def open(table_dir: str, config: EngineConfig | None = None) -> "Table":
        if mf.read_latest_version(table_dir) is None:
            raise FileNotFoundError(f"no table at {table_dir}")
        return Table(table_dir, config)

    # -- metadata -----------------------------------------------------------

    def latest_version(self) -> int:
        v = mf.read_latest_version(self.table_dir)
        if v is None:
            raise FileNotFoundError(f"no table at {self.table_dir}")
        return v

    def _read_fragment_schema(self, rel_path: str) -> pa.Schema:
        full = _fs.join(self.table_dir, rel_path)
        if _fs.is_uri(full):
            filesystem, stripped = _fs.arrow_fs(full)
            return pq.read_schema(stripped, filesystem=filesystem)
        return pq.read_schema(full)

    def manifest(self, version: int | None = None) -> Manifest:
        return mf.read_manifest(self.table_dir, self.latest_version() if version is None else version)

    def versions(self) -> list[int]:
        return mf.list_versions(self.table_dir)

    def schema(self, version: int | None = None) -> pa.Schema:
        """Declared (manifest) schema when parsable — the authority
        after schema evolution; falls back to the first fragment's
        parquet footer, then to the canonical default."""
        m = self.manifest(version)
        declared = mf.schema_from_manifest(m)
        if declared is not None and m.fragments:
            return declared
        if m.fragments:
            return self._read_fragment_schema(m.fragments[0].path)
        if declared is not None:
            return declared
        return SEQUENCES_SCHEMA

    def history(self) -> list[dict]:
        """Version log, newest first: one dict per surviving manifest
        with operation, parent, row/fragment/byte totals and op
        properties (phase timings, strategies — A5 metrics surface;
        the reference exposes the analogue through Lance versioning)."""
        out = []
        for v in sorted(self.versions(), reverse=True):
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m.operation,
                    "parent_version": m.parent_version,
                    "rows": sum(f.live_rows for f in m.fragments),
                    "fragments": len(m.fragments),
                    "bytes": sum(f.bytes for f in m.fragments),
                    "created_unix": m.created_unix,
                    "properties": m.properties,
                }
            )
        return out

    def version_at(self, as_of_unix: float) -> int:
        """Time travel: the latest version committed at or before the
        given unix timestamp (Delta's ``timestampAsOf`` / Iceberg's
        ``as-of-timestamp``). Commit times are the manifest's
        ``created_unix`` stamped by the commit actor, so they are
        monotone along the linear history. Raises if the table has no
        version that old."""
        best = None
        for v in self.versions():
            # header-only read: no shard member lists for time travel
            m = mf.read_manifest_header(self.table_dir, v)
            if m.created_unix <= as_of_unix and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"no version of {self.table_dir} existed at unix {as_of_unix}"
            )
        return best

    # -- snapshot pins ------------------------------------------------------

    def pin(self, name: str, version: int | None = None) -> int:
        v = self.latest_version() if version is None else version
        if v not in self.versions():
            raise ValueError(f"cannot pin missing version v{v}")
        mf.write_pin(self.table_dir, name, v)
        return v

    def unpin(self, name: str) -> None:
        mf.remove_pin(self.table_dir, name)

    def pins(self) -> dict[str, int]:
        return mf.read_pins(self.table_dir)

    # -- scan ---------------------------------------------------------------

    def fragment_paths(
        self, version: int | None = None, predicate: list[tuple] | None = None
    ) -> list[str]:
        m = self.manifest(version)
        frags = m.fragments
        if predicate:
            # same stale-column guard as scan(): a conjunct on a column
            # whose physical incarnation in this fragment is outdated
            # (dropped + re-added field id) must not prune by stale
            # stats or stale bucket tags
            frags = [
                f
                for f in frags
                for live in [[p for p in predicate if f.has_column(p[0], m.column_ids)]]
                if mf.fragment_may_match(f, live)
                and mf.fragment_bucket_may_match(f, live)
            ]
        return [_fs.join(self.table_dir, f.path) for f in frags]

    def scan(
        self,
        version: int | None = None,
        columns: Sequence[str] | None = None,
        predicate: list[tuple] | None = None,
        paths_subset: set[str] | None = None,
        as_of_unix: float | None = None,
        **read_kwargs: Any,
    ) -> ray.data.Dataset:
        """Snapshot-consistent scan → lazy ``ray.data.Dataset``.

        Fragments are pruned by zone map before the read (metadata
        only, driver-side, cheap) and the same predicate is pushed
        down to Parquet row groups (``filter=``) — the two-level prune
        Lance does implicitly for the reference (searcher.py:207-208).
        ``paths_subset`` restricts the scan to the named fragment rel
        paths (changelog's fragment-diff read) with the same schema
        reconciliation as a full scan. ``as_of_unix`` resolves the
        version by commit timestamp instead (time travel); mutually
        exclusive with ``version``.
        """
        if as_of_unix is not None:
            if version is not None:
                raise ValueError("pass either version or as_of_unix, not both")
            version = self.version_at(as_of_unix)
        resolved_v = self.latest_version() if version is None else version
        if predicate and paths_subset is None:
            # two-level prune on sharded manifests: drop whole shards
            # by aggregate zone map before their member lists are even
            # read (inline manifests fall through unchanged)
            m = mf.read_manifest_pruned(self.table_dir, resolved_v, predicate)
        else:
            m = mf.read_manifest(self.table_dir, resolved_v)
        frags = m.fragments
        if paths_subset is not None:
            frags = [f for f in frags if f.path in paths_subset]
        if predicate:
            # zone-map prune — but a fragment whose physical incarnation
            # of a predicate column is stale (dropped + re-added name:
            # field-id mismatch) must not be pruned by that column's
            # stale stats; its rows carry the new default instead.
            # Bucket-tagged fragments additionally prune point
            # conjuncts on the layout key by exact hash (1/n of the
            # table survives a point lookup before any bloom read).
            frags = [
                f
                for f in frags
                for live in [[p for p in predicate if f.has_column(p[0], m.column_ids)]]
                if mf.fragment_may_match(f, live)
                and mf.fragment_bucket_may_match(f, live)
            ]
        if not frags:
            schema = self.schema(version)
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            return ray.data.from_arrow(schema.empty_table())
        return self.scan_fragments(m, frags, columns, predicate, **read_kwargs)

    def row_group_prune_stats(
        self, predicate: list[tuple], version: int | None = None
    ) -> dict[str, int]:
        """Two-level prune diagnostic: how much of the table a
        predicate scan actually reads.

        Level 1 is the manifest zone-map/bloom prune (whole fragments,
        driver-side, metadata only). Level 2 happens INSIDE each read
        task: ``scan`` pushes ``predicate_to_arrow(predicate)`` down as
        the Parquet scanner filter, and pyarrow skips row groups whose
        footer statistics exclude it (fragments are written with 32k-row
        row groups, so a 256-512MB fragment holds dozens of
        independently skippable groups). This method evaluates the SAME
        expression against the footers of the surviving fragments —
        driver-side and eager, so use it for tests/ops-audits, not in
        pipelines. Returns fragment and row-group counts at each level.
        """
        import pyarrow.dataset as pads

        m = self.manifest(version)
        # mirror scan()'s full level-1 prune (zone maps AND bucket
        # tags) so the diagnostic reports what a scan actually reads
        survivors = [
            f
            for f in m.fragments
            for live in [[p for p in predicate if f.has_column(p[0], m.column_ids)]]
            if mf.fragment_may_match(f, live)
            and mf.fragment_bucket_may_match(f, live)
        ]
        expr = mf.predicate_to_arrow(predicate)
        filesystem = None
        paths = [_fs.join(self.table_dir, f.path) for f in survivors]
        if _fs.is_uri(self.table_dir):
            filesystem, _ = _fs.arrow_fs(self.table_dir)
            paths = [_fs.get_fs(p)[1] for p in paths]
        total_rg = kept_rg = 0
        if paths:
            ds = pads.dataset(paths, filesystem=filesystem)
            for frag in ds.get_fragments():
                frag.ensure_complete_metadata()
                total_rg += frag.metadata.num_row_groups
                kept_rg += len(frag.split_by_row_group(expr))
        return {
            "fragments_total": len(m.fragments),
            "fragments_after_zone_maps": len(survivors),
            "row_groups_in_survivors": total_rg,
            "row_groups_after_footer_stats": kept_rg,
        }

    def scan_fragments(
        self,
        m: Manifest,
        frags: list[FragmentMeta],
        columns: Sequence[str] | None = None,
        predicate: list[tuple] | None = None,
        **read_kwargs: Any,
    ) -> ray.data.Dataset:
        """Read an explicit fragment list with the full scan treatment
        (schema-evolution padding, predicate pushdown-or-mask, URI
        filesystems). The fragments need not be committed — staged
        (write-audit-publish) fragments go through here too."""
        declared = mf.schema_from_manifest(m)
        read_cols = list(columns) if columns is not None else (
            list(declared.names) if declared is not None else None
        )
        pred_cols = sorted({c for c, _, _ in predicate}) if predicate else []

        # schema evolution: partition fragments by how their FILE
        # deviates from the declared schema for the needed columns
        # (requested + predicate) — missing/stale columns (padded with
        # the default), renamed columns (file carries the old name
        # under the same field id: read old, emit declared), and
        # narrower physical types (pre-widen fragments: cast per
        # batch). All per-fragment metadata from the manifest; footer
        # read only for pre-evolution metas. A stale column (re-added
        # name, old field id) counts as missing so its old values are
        # never read.
        GroupKey = tuple  # (missing, renames phys→decl, cast col names)
        groups: dict[GroupKey, list[FragmentMeta]] = {}
        empty_key = (frozenset(), frozenset(), frozenset())
        if declared is not None and read_cols is not None:
            need = (set(read_cols) | set(pred_cols)) & set(declared.names)
            for f in frags:
                renames: set[tuple[str, str]] = set()
                casts: set[str] = set()
                if f.cols is None and f.col_ids is None:
                    have = set(self._read_fragment_schema(f.path).names)
                    missing = frozenset(need - have)
                else:
                    miss = set()
                    for c in need:
                        phys = f.physical_name(c, m.column_ids)
                        if phys is None:
                            miss.add(c)
                            continue
                        if phys != c:
                            renames.add((phys, c))
                        ft = (f.col_types or {}).get(phys)
                        if ft is not None and ft != str(declared.field(c).type):
                            casts.add(c)
                    missing = frozenset(miss)
                key = (missing, frozenset(renames), frozenset(casts))
                groups.setdefault(key, []).append(f)
        else:
            groups[empty_key] = list(frags)

        def build(
            group: list[FragmentMeta],
            missing: frozenset,
            renames: frozenset = frozenset(),
            casts: frozenset = frozenset(),
        ) -> ray.data.Dataset:
            # deletion-vector fragments need a positional mask BEFORE
            # any predicate/limit — plain read_parquet pushdown would
            # shift row positions, so they read via per-fragment tasks
            # (ops/dv.py) and take the in-memory predicate branch
            dv_frags = [f for f in group if f.dv_path]
            paths = [
                _fs.join(self.table_dir, f.path) for f in group if not f.dv_path
            ]
            kwargs: dict[str, Any] = dict(read_kwargs)
            # declared -> physical file name for renamed columns; a
            # predicate on a renamed column cannot push down (the file
            # knows the old name), so it falls to the in-memory mask
            # AFTER the pad step restores declared names. Numeric casts
            # (widen) push down fine — Arrow promotes the literals.
            phys_of = {decl: phys for phys, decl in renames}
            pushdown = predicate and not any(
                c in missing or c in phys_of for c, _, _ in predicate
            )
            # predicate columns the pad/mask step needs that weren't
            # requested: read them (when present) so the mask can be
            # evaluated in-memory, then drop them from the output
            mask_cols: list[str] = []
            if predicate and (not pushdown or dv_frags) and read_cols is not None:
                mask_cols = [
                    c
                    for c in pred_cols
                    if c not in set(read_cols) and declared is not None
                    and c in declared.names
                ]
            # mask-only columns are PER BRANCH: the plain read needs
            # them only when the predicate runs in memory (no
            # pushdown); the DV read always evaluates in memory. A
            # shared column list would leak null-padded mask columns
            # out of the pushdown branch and union mismatched schemas.
            plain_mask_cols = [] if pushdown else mask_cols

            def branch_cols(mcols: list[str]) -> list[str] | None:
                if read_cols is None:
                    return None
                return [
                    phys_of.get(c, c)
                    for c in read_cols + mcols
                    if c not in missing
                ]

            def make_pad(apply_pred: bool, mcols: list[str]):
                """Normalize a batch to the declared shape: fill
                evolution-missing columns, restore declared names for
                renamed columns, cast pre-widen narrow types,
                optionally evaluate the predicate in memory, drop
                mask-only columns."""
                defaults = dict(m.column_defaults)
                fields = [
                    (c, declared.field(c).type, defaults.get(c))
                    for c in read_cols + mcols
                ]
                pred = list(predicate) if (predicate and apply_pred) else None

                def pad(batch: pa.Table) -> pa.Table:
                    cols_out = {}
                    for name, typ, dflt in fields:
                        src = phys_of.get(name, name)
                        # a column in `missing` must never be served
                        # from the file — its file name may coincide
                        # with another declared column's rename source
                        # (retired name re-added: the old data would
                        # resurrect under the fresh field id)
                        if name not in missing and src in batch.column_names:
                            col = batch[src]
                            if col.type != typ:
                                col = col.cast(typ)
                            cols_out[name] = col
                        elif dflt is not None:
                            cols_out[name] = pa.array(
                                [dflt] * batch.num_rows, type=typ
                            )
                        else:
                            cols_out[name] = pa.nulls(batch.num_rows, typ)
                    out = pa.table(cols_out)
                    if pred:
                        out = out.filter(mf.predicate_mask(out, pred))
                    return out.select(read_cols) if mcols else out

                return pad

            parts: list[ray.data.Dataset] = []
            if paths:
                file_cols = branch_cols(plain_mask_cols)
                if file_cols is not None:
                    kwargs["columns"] = file_cols
                if pushdown:
                    kwargs["filter"] = mf.predicate_to_arrow(predicate)
                if "override_num_blocks" not in kwargs:
                    if self.config.read_override_num_blocks:
                        kwargs["override_num_blocks"] = (
                            self.config.read_override_num_blocks
                        )
                    else:
                        # default: one block per fragment. Ray's auto-estimate
                        # inserts a SplitBlocks step that BREAKS read↔map
                        # fusion, pushing the whole payload through the object
                        # store between the two operators; one task per
                        # target-sized fragment keeps the read fused with the
                        # consumer and makes the fragment the parallelism unit
                        kwargs["override_num_blocks"] = len(paths)
                # route every scheme through one fsspec-backed pyarrow
                # filesystem; the wrapper pickles into the read tasks so
                # worker processes resolve the same protocol (S8)
                paths, fs_kwargs = _fs.ray_read_paths(paths)
                ds = ray.data.read_parquet(paths, **kwargs, **fs_kwargs)
                if missing or plain_mask_cols or renames or casts:
                    ds = ds.map_batches(
                        make_pad(apply_pred=not pushdown, mcols=plain_mask_cols),
                        batch_format="pyarrow",
                    )
                parts.append(ds)
            if dv_frags:
                from fupi_ray.ops import dv as _dv

                dds = _dv.dv_fragments_dataset(
                    self.table_dir, dv_frags, columns=branch_cols(mask_cols)
                )
                # the predicate ALWAYS runs in memory here — file-level
                # pushdown would shift the positions the mask needs
                if (missing or predicate or mask_cols or renames or casts) and (
                    declared is not None and read_cols is not None
                ):
                    dds = dds.map_batches(
                        make_pad(apply_pred=bool(predicate), mcols=mask_cols),
                        batch_format="pyarrow",
                    )
                elif predicate:
                    pred = list(predicate)
                    dds = dds.map_batches(
                        lambda b: b.filter(mf.predicate_mask(b, pred)),
                        batch_format="pyarrow",
                    )
                parts.append(dds)
            ds = parts[0]
            for other in parts[1:]:
                ds = ds.union(other)
            return ds

        datasets = [
            build(group, missing, renames, casts)
            for (missing, renames, casts), group in groups.items()
        ]
        ds = datasets[0]
        for other in datasets[1:]:
            ds = ds.union(other)
        return ds

    # -- metadata tables (Iceberg-style files / snapshots inspection) --------

    def files(self, version: int | None = None) -> pa.Table:
        """One row per fragment of the (pinned) snapshot: physical
        stats, DV state, bucket tag and the doc_id/n_tok zone ranges —
        Iceberg's ``table$files``. Pure manifest metadata (no data
        read); tiny, so it returns an Arrow table directly."""
        m = self.manifest(version)

        def zm(f: FragmentMeta, col: str, end: str):
            v = f.zone_map.get(col, {}).get(end)
            return None if v is None else v

        rows = [
            {
                "path": f.path,
                "rows": f.rows,
                "live_rows": f.live_rows,
                "bytes": f.bytes,
                "sum_n_tok": f.sum_n_tok,
                "dv_rows": f.dv_rows,
                "bucket": f.bucket,
                "bucket_sig": f.bucket_sig,
                "doc_id_min": zm(f, "doc_id", "min"),
                "doc_id_max": zm(f, "doc_id", "max"),
                "n_tok_min": zm(f, "n_tok", "min"),
                "n_tok_max": zm(f, "n_tok", "max"),
            }
            for f in m.fragments
        ]
        schema = pa.schema(
            [
                ("path", pa.string()),
                ("rows", pa.int64()),
                ("live_rows", pa.int64()),
                ("bytes", pa.int64()),
                ("sum_n_tok", pa.int64()),
                ("dv_rows", pa.int64()),
                ("bucket", pa.int64()),
                ("bucket_sig", pa.string()),
                ("doc_id_min", pa.string()),
                ("doc_id_max", pa.string()),
                ("n_tok_min", pa.int64()),
                ("n_tok_max", pa.int64()),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    def snapshots(self) -> pa.Table:
        """One row per surviving version, newest first — Iceberg's
        ``table$snapshots`` over :meth:`history`."""
        hist = self.history()
        return pa.Table.from_pylist(
            [
                {
                    "version": h["version"],
                    "operation": h["operation"],
                    "parent_version": h["parent_version"],
                    "rows": h["rows"],
                    "fragments": h["fragments"],
                    "bytes": h["bytes"],
                    "created_unix": h["created_unix"],
                }
                for h in hist
            ],
            schema=pa.schema(
                [
                    ("version", pa.int64()),
                    ("operation", pa.string()),
                    ("parent_version", pa.int64()),
                    ("rows", pa.int64()),
                    ("fragments", pa.int64()),
                    ("bytes", pa.int64()),
                    ("created_unix", pa.float64()),
                ]
            ),
        )

    # -- metadata-only aggregates ---------------------------------------------

    def count_rows(self, version: int | None = None) -> int:
        """Exact logical row count of a snapshot from the manifest
        alone (physical rows minus deletion-vector rows) — O(metadata),
        no data file is opened. The reference pays a table scan for
        this (LanceDB ``count_rows`` walks fragment metadata the same
        way); at 10^12 rows an exact COUNT(*) must not read data."""
        return self.manifest(version).total_rows

    def column_range(self, column: str, version: int | None = None) -> dict:
        """Min/max of ``column`` merged from fragment zone maps —
        O(metadata). Returns ``{"min", "max", "exact"}``.

        ``exact=True`` only when the bounds are provably attained:
        every fragment with live rows either carries a zone entry for
        the column and no deletion vector (a DV may have deleted the
        extreme rows, leaving the zone map a sound OUTER bound), or
        physically lacks the column (pre-evolution file: its rows
        surface the declared default, which is folded in; absent a
        default they surface null, which MIN/MAX ignore). A fragment
        whose zone entry was conservatively omitted at write time
        (all-null / NaN / oversized string) also degrades to
        ``exact=False`` — the bounds stay sound, just not tight.
        SQL convention: an all-null or empty table yields min=max=None
        with ``exact=True``."""
        m = self.manifest(version)
        if column not in m.schema_names:
            raise ValueError(f"column_range: unknown column {column!r}")
        lo = hi = None
        exact = True

        def fold(a, b):
            nonlocal lo, hi
            lo = a if lo is None or a < lo else lo
            hi = b if hi is None or b > hi else hi

        for f in m.fragments:
            if not f.live_rows:
                continue
            if f.col_ids is not None and m.column_ids:
                phys = f.physical_name(column, m.column_ids)
            else:
                phys = column if (f.cols is None or column in f.cols) else None
            if phys is None:
                d = m.column_defaults.get(column)
                if d is not None:
                    fold(d, d)
                continue  # no default: rows surface null → no extreme
            z = f.zone_map.get(phys, {})
            zmin, zmax = z.get("min"), z.get("max")
            if zmin is None or zmax is None:
                exact = False  # omitted entry: sound but unknown
                continue
            if f.dv_rows:
                exact = False  # outer bound: the extreme may be deleted
            fold(zmin, zmax)
        return {"min": lo, "max": hi, "exact": exact}

    # -- ordered scan (zone-map order proof) ---------------------------------

    def order_proof(self, by: str, version: int | None = None) -> dict:
        """Can ``scan_sorted(by)`` skip the global sort?

        The proof is pure manifest metadata: if every fragment has a
        zone map for ``by`` and the [min, max] ranges are pairwise
        non-overlapping when ordered by min, then locally sorting each
        fragment and concatenating them in zone order IS the global
        order (equal boundary values are fine — a sorted sequence
        allows equal adjacent values). Fragments written before the
        column existed have no zone entry and fail the proof, which
        also covers evolution-padded columns (their pad value is not
        in any zone map). Nulls never appear in zone-mapped columns
        (mins/maxes are computed over written values only and the
        engine's zone columns are non-null by construction)."""
        m = self.manifest(version)
        if not m.fragments:
            return {"provable": True, "fragments": 0, "overlapping_pairs": 0}
        zones = []
        for f in m.fragments:
            zm = f.zone_map.get(by)
            if (
                zm is None
                or zm.get("min") is None
                or not f.has_column(by, m.column_ids)
            ):
                return {
                    "provable": False,
                    "fragments": len(m.fragments),
                    "reason": f"no usable zone map for {by!r} on {f.path}",
                }
            zones.append((zm["min"], zm["max"]))
        zones.sort()
        overlaps = sum(1 for a, b in zip(zones, zones[1:]) if a[1] > b[0])
        return {
            "provable": overlaps == 0,
            "fragments": len(m.fragments),
            "overlapping_pairs": overlaps,
        }

    def scan_sorted(
        self,
        by: str,
        columns: Sequence[str] | None = None,
        descending: bool = False,
        version: int | None = None,
    ) -> ray.data.Dataset:
        """Scan ordered by ``by`` — without the all-to-all sort when
        the layout proves it away.

        When ``order_proof(by)`` holds (e.g. fragments appended from
        an already-ordered stream, or doc_id-clustered output), the
        plan is: one task per fragment, in zone-map order, each
        locally sorting its own rows — an embarrassingly parallel
        map with order-preserving concat, instead of Ray's
        range-partition exchange over the full table. Falls back to
        ``scan().sort()`` when the proof fails. Deletion vectors,
        renamed columns and evolution padding are honored either way.
        """
        proof = self.order_proof(by, version)
        if not proof["provable"]:
            # the fallback must also be able to sort when the caller's
            # projection excludes `by`: read it, sort, project it away
            if columns is not None and by not in columns:
                ds = self.scan(version, columns=list(columns) + [by])
                keep = list(columns)
                return ds.sort(by, descending=descending).map_batches(
                    lambda b: b.select(keep), batch_format="pyarrow"
                )
            return self.scan(version, columns=columns).sort(by, descending=descending)
        m = self.manifest(version)
        frags = sorted(
            m.fragments,
            key=lambda f: (f.zone_map[by]["min"], f.zone_map[by]["max"]),
            reverse=descending,
        )
        if not frags:
            return self.scan(version, columns=columns)
        read_cols = list(columns) if columns is not None else list(m.schema_names)
        inner_cols = read_cols if by in read_cols else read_cols + [by]
        import json as _json

        from fupi_ray.state import fragread

        types = dict(zip(m.schema_names, m.schema_types))
        names = [c for c in inner_cols if c in types]
        typestrs = [types[c] for c in names]
        fill = {c: (m.column_defaults or {}).get(c) for c in names}
        items = [
            {"spec": _json.dumps(fragread.fragment_spec(f, m.column_ids, names))}
            for f in frags
        ]
        table_dir = self.table_dir
        order = "descending" if descending else "ascending"

        def read_sorted(batch: pa.Table) -> pa.Table:
            from fupi_ray.state.fragread import read_fragment_normalized

            outs = []
            for spec_s in batch["spec"].to_pylist():
                t = read_fragment_normalized(
                    table_dir, _json.loads(spec_s), names, typestrs, fill
                )
                outs.append(t.sort_by([(by, order)]).select(read_cols))
            return outs[0] if len(outs) == 1 else pa.concat_tables(outs)

        return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
            read_sorted, batch_format="pyarrow", batch_size=None
        )

    # -- commits ------------------------------------------------------------

    def _commit(
        self,
        operation: str,
        fragments: list[FragmentMeta],
        expected_parent: int | None,
        properties: dict | None = None,
        schema_override: pa.Schema | None = None,
        column_defaults: dict | None = None,
        column_ids_override: dict[str, int] | None = None,
    ) -> int:
        names, types, defaults = self._next_schema(operation, fragments, schema_override)
        if column_defaults is not None:
            defaults = column_defaults
        # Iceberg-style field ids: carry the parent's ids for surviving
        # names, retire dropped ones, mint fresh ids for new names (a
        # re-added name therefore gets a NEW id and pre-drop fragments
        # no longer satisfy it by name). ``column_ids_override`` lets
        # rename_column MOVE an id to a new name instead of minting
        # (the id is the column's identity; the name is display).
        ids: dict[str, int] = {}
        next_id = 0
        if mf.read_latest_version(self.table_dir) is not None:
            pm = self.manifest()
            ids = {n: i for n, i in pm.column_ids.items() if n in names}
            next_id = max([pm.next_column_id] + [i + 1 for i in pm.column_ids.values()])
        if column_ids_override:
            ids.update({n: i for n, i in column_ids_override.items() if n in names})
            next_id = max([next_id] + [i + 1 for i in ids.values()])
        for n in names:
            if n not in ids:
                ids[n] = next_id
                next_id += 1
        for f in fragments:
            if f.col_ids is None and f.cols is not None:
                f.col_ids = {c: ids[c] for c in f.cols if c in ids}
        m = Manifest(
            version=-1,
            parent_version=None,
            operation=operation,
            schema_names=names,
            schema_types=types,
            fragments=fragments,
            properties=properties or {},
            column_defaults=defaults,
            column_ids=ids,
            next_column_id=next_id,
        )
        return commit_mod.commit(self.table_dir, m, expected_parent)

    def _next_schema(
        self,
        operation: str,
        fragments: list[FragmentMeta],
        schema_override: pa.Schema | None,
    ) -> tuple[list[str], list[str], dict]:
        """Declared schema of the next manifest. Priority: explicit
        override (evolve ops) > parent's declared schema (carried
        forward with its defaults — fragments never silently change the
        table's contract) > first new fragment's file schema (first
        data commit / overwrite defines the contract) > canonical."""
        if schema_override is not None:
            n, t = _schema_lists(schema_override)
            return n, t, {}
        parent_m = None
        if mf.read_latest_version(self.table_dir) is not None:
            parent_m = self.manifest()
        if (
            operation != "overwrite"
            and parent_m is not None
            and parent_m.schema_names
            and parent_m.fragments
        ):
            return (
                list(parent_m.schema_names),
                list(parent_m.schema_types),
                dict(parent_m.column_defaults),
            )
        if fragments:
            s = self._read_fragment_schema(fragments[0].path)
            n, t = _schema_lists(s)
            return n, t, {}
        if parent_m is not None and parent_m.schema_names:
            return list(parent_m.schema_names), list(parent_m.schema_types), dict(
                parent_m.column_defaults
            )
        n, t = _schema_lists(SEQUENCES_SCHEMA)
        return n, t, {}

    def _constrained(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Insert the commit-time invariant check (ops/constraints.py)
        into a write pipeline: a zero-copy pass-through that fails the
        write task on the first violating batch, BEFORE any fragment
        is committed. No-op when the table declares no constraints."""
        from fupi_ray.ops import constraints as _con

        cons = _con.read_constraints(self.table_dir)
        if not cons:
            return ds
        defaults = dict(self.manifest().column_defaults or {})
        return ds.map_batches(
            _con.ConstraintChecker(cons, defaults), batch_format="pyarrow"
        )

    def commit_overwrite(self, ds: ray.data.Dataset, properties: dict | None = None) -> int:
        """Replace the table contents (reference: create_table
        mode='overwrite', fupi/utils.py:39-49). Old fragments stay on
        disk for pinned readers until expiry GCs them. An overwrite's
        outcome is independent of the parent's contents, so a
        concurrent-commit conflict is auto-rebased like an append."""
        frags = write_dataset_fragments(
            self._constrained(ds), self.table_dir, "ow",
            bloom_bits=self.config.bloom_bits_per_key,
            row_group_rows=self.config.row_group_rows,
        )
        return self._commit_rebasing("overwrite", lambda _parent: frags, properties)

    def commit_append(
        self,
        ds: ray.data.Dataset,
        properties: dict | None = None,
        target_fragment_rows: int | None = None,
    ) -> int:
        """Append new fragments (reference: table.add,
        fupi/embedders.py:124-125); manifest v+1 = parent ∪ new.
        ``target_fragment_rows`` forces small fragments (test fixtures
        mimicking post-ingest small-file state)."""
        new = write_dataset_fragments(
            self._constrained(ds),
            self.table_dir,
            "ap",
            target_fragment_rows=target_fragment_rows,
            bloom_bits=self.config.bloom_bits_per_key,
            row_group_rows=self.config.row_group_rows,
        )
        return self._commit_rebasing(
            "append", lambda parent: self.manifest(parent).fragments + new, properties
        )

    def _commit_rebasing(
        self,
        operation: str,
        fragments_for_parent,
        properties: dict | None = None,
        max_retries: int = 8,
    ) -> int:
        """Commit with automatic rebase on optimistic-concurrency
        conflicts. Safe ONLY for ops whose new fragments don't depend
        on the parent's fragment CONTENTS (append: union with whatever
        the latest fragment list is; overwrite: replaces it outright).
        Swap ops (compact/cluster/merge/delete) must NOT auto-rebase —
        their rewrites were computed against a specific snapshot, so a
        conflict there correctly surfaces as CommitError."""
        last_err: Exception | None = None
        for _ in range(max_retries + 1):
            parent = self.latest_version()
            try:
                return self._commit(
                    operation, fragments_for_parent(parent), parent, properties
                )
            except commit_mod.CommitError as e:
                last_err = e  # another writer advanced _latest: rebase
            except FileNotFoundError as e:
                # the parent manifest vanished between latest_version()
                # and the read: a concurrent commit advanced _latest and
                # a concurrent expire_snapshots then dropped our (now
                # non-latest) parent — same staleness as a commit
                # conflict, so rebase onto the new latest. (Expiry never
                # deletes the CURRENT latest, so retries converge.)
                last_err = e
        raise commit_mod.CommitError(
            f"{operation} lost the commit race {max_retries + 1} times"
        ) from last_err

    def commit_fragment_swap(
        self,
        remove_paths: set[str],
        add: list[FragmentMeta],
        operation: str,
        expected_parent: int | None = None,
        properties: dict | None = None,
        schema_override: pa.Schema | None = None,
        column_defaults: dict | None = None,
        column_ids_override: dict[str, int] | None = None,
    ) -> int:
        """Manifest rewrite: swap a subset of fragments for new ones
        (compaction / clustering / MERGE / schema-evolution commit
        primitive)."""
        parent = self.latest_version() if expected_parent is None else expected_parent
        kept = [f for f in self.manifest(parent).fragments if f.path not in remove_paths]
        return self._commit(
            operation,
            kept + add,
            parent,
            properties,
            schema_override=schema_override,
            column_defaults=column_defaults,
            column_ids_override=column_ids_override,
        )
