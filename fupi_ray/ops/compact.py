"""Small-file compaction: size-budgeted bin-packing + manifest swap.

The reference calls LanceDB's ``table.compact_files()`` after every
ingest (fupi/embedders.py:127-128) — an opaque library op. Here it is
explicit (SURVEY.md §2.1 S6): a metadata-only planner (greedy byte
bin-packing over fragment stats — bytes, not rows, because token-list
skew makes bytes/row wildly uneven, SURVEY.md §4) and an executor of
independent per-pack Ray tasks that stream-merge Parquet row groups.

Per-pack = per-partition: each pack writes its output fragment under a
job-scoped deterministic name, then a lineage record; a resumed job
skips completed packs (north rule: resumable with per-partition
lineage). The manifest swap commits once, at the end, through the
commit actor.

Content-preserving: the post-compaction canonical scan (sorted by
doc_id) is row-for-row token-array-equal to the pre-compaction scan.

Raw ``ray.remote`` tasks are used deliberately here instead of a
Dataset pipeline: the Dataset API cannot express "coalesce exactly
these files into exactly one file per pack with deterministic names" —
this is file-layout surgery, not a row transform (SURVEY.md guidance:
drop to tasks only where Dataset semantics don't fit).
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass

import pyarrow.parquet as pq
import ray

from fupi_ray import manifest as mf
from fupi_ray.manifest import FragmentMeta
from fupi_ray.state import fs as _fs
from fupi_ray.state import lineage
from fupi_ray.table import Table


@dataclass
class CompactionPlan:
    packs: list[list[FragmentMeta]]  # each pack → one output fragment
    untouched: list[FragmentMeta]

    @property
    def num_input_fragments(self) -> int:
        return sum(len(p) for p in self.packs)


def plan_compaction(
    fragments: list[FragmentMeta],
    target_bytes: int,
    min_fill: float = 0.5,
    max_rows: int = 4_000_000,
) -> CompactionPlan:
    """Greedy bin-packing over fragment metadata (driver-side, tiny).

    Fragments already ≥ ``min_fill × target_bytes`` are left alone.
    Small fragments are ordered by zone-map min(doc_id) so packed
    output keeps key locality (tight zone maps survive compaction),
    then greedily packed under the byte budget with a row clamp.
    """
    # a fragment carrying a deletion vector is ALWAYS compactable —
    # repacking drops its masked rows and clears the DV (merge-on-read
    # deletes are materialized here, bounding the scan-side mask cost
    # by the maintenance cadence)
    big = [f for f in fragments if f.bytes >= min_fill * target_bytes and not f.dv_rows]
    small = [f for f in fragments if f.bytes < min_fill * target_bytes or f.dv_rows]
    # bucket-layout preservation: fragments of a bucketed table
    # (ops/bucket.py) pack only WITHIN their bucket, so compaction
    # never invalidates the shuffle-free-join contract; the bucket key
    # sorts first (None → untagged tables are unaffected)
    small.sort(
        key=lambda f: (
            f.bucket_sig or "",
            f.bucket if f.bucket is not None else -1,
            f.zone_map.get("doc_id", {}).get("min") or "",
            f.path,
        )
    )

    packs: list[list[FragmentMeta]] = []
    cur: list[FragmentMeta] = []
    cur_bytes = cur_rows = 0
    for f in small:
        if cur and (
            cur_bytes + f.bytes > target_bytes
            or cur_rows + f.rows > max_rows
            or f.bucket != cur[0].bucket
            or f.bucket_sig != cur[0].bucket_sig
        ):
            packs.append(cur)
            cur, cur_bytes, cur_rows = [], 0, 0
        cur.append(f)
        cur_bytes += f.bytes
        cur_rows += f.rows
    if cur:
        packs.append(cur)
    # a pack of one gains nothing — leave the lone fragment in place,
    # UNLESS it has a deletion vector to materialize
    untouched = big + [p[0] for p in packs if len(p) == 1 and not p[0].dv_rows]
    packs = [p for p in packs if len(p) > 1 or p[0].dv_rows]
    return CompactionPlan(packs=packs, untouched=untouched)


def _rename_ident(rename_maps: list[dict] | None) -> str:
    """Lineage identity of the pack's rename reconciliation: a retry
    after a rename_column must not reuse a pre-rename record (it would
    re-commit fragments whose renamed column was dropped)."""
    if not rename_maps or not any(rename_maps):
        return ""
    return ";".join(
        ",".join(f"{k}>{v}" for k, v in sorted((rm or {}).items()))
        for rm in rename_maps
    )


def _repack(
    table_dir: str,
    job_id: str,
    pack_idx: int,
    input_rel_paths: list[str],
    row_group_rows: int,
    schema_names: list[str] | None = None,
    schema_types: list[str] | None = None,
    column_defaults: dict | None = None,
    bloom_bits: int | None = None,
    input_dv_rels: list | None = None,
    input_rename_maps: list[dict] | None = None,
    bucket: int | None = None,
    bucket_sig: str | None = None,
) -> dict:
    """Stream-merge one pack of small fragments into one fragment.

    Streams row groups through a ParquetWriter — peak memory is one
    row group, not the whole pack, so 256 MiB packs are safe in a
    1-CPU worker. Deletion vectors are MATERIALIZED: masked rows are
    dropped per row group (positions sliced by a running offset) and
    the output carries no DV. Idempotent: writes to a temp file then
    renames to a job-deterministic name; lineage record written only
    after rename.
    """
    partition = f"pack-{pack_idx:05d}"
    # DV identity of the pack; a pack with NO deletion vectors
    # normalizes to "" so records written before the DV feature (or by
    # callers that omit the argument) stay reusable
    dv_ident = (
        ",".join(d or "" for d in input_dv_rels)
        if input_dv_rels and any(input_dv_rels)
        else ""
    )
    existing = lineage.read_record(table_dir, job_id, partition)
    if existing is not None:
        # a record is only reusable if it was computed over the SAME
        # inputs: after an intervening commit, pack index i can map to
        # a different input set (or the same file to a NEWER deletion
        # vector) — reusing the stale outputs would silently
        # drop/duplicate rows
        if (
            existing.get("input_fragments") == input_rel_paths
            and existing.get("metrics", {}).get("input_dvs", "") == dv_ident
            and existing.get("metrics", {}).get("renames", "")
            == _rename_ident(input_rename_maps)
        ):
            return existing

    rel_out = f"data/cp-{job_id}-{pack_idx:05d}.parquet"
    abs_out = _fs.join(table_dir, rel_out)
    t0 = time.perf_counter()
    rows = 0
    writer = None
    uri = _fs.is_uri(abs_out)
    if uri:
        # object-store protocol: stream row groups into one put (the
        # object appears atomically when the handle closes); no rename
        sink = _fs.open_write(abs_out)
        tmp = None
    else:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(abs_out), suffix=".parquet.tmp"
        )
        os.close(fd)
        sink = tmp
    import pyarrow as pa
    import pyarrow.compute as pc

    # schema evolution: packs can mix pre- and post-evolution files;
    # every row group is normalized to the DECLARED schema (missing
    # columns filled from defaults/null, dropped columns removed) so
    # the rewrite materializes the evolved shape
    declared = None
    fill: dict = {}
    if schema_names:
        try:
            declared = pa.schema(
                [(n, mf.type_from_str(t)) for n, t in zip(schema_names, schema_types)]
            )
            fill = {
                n: (column_defaults or {}).get(n) for n in schema_names if n != "doc_id"
            }
        except ValueError:
            declared = None

    from fupi_ray.schema import normalize_batch

    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    poisoned: set[str] = set()  # NaN-containing float columns: no zone entry
    sum_n_tok = 0
    hash_chunks: list = []  # doc_id hashes, 8 B/row — feeds the bloom sidecar
    try:
        buf: list[pa.Table] = []
        buf_rows = 0

        written_schema = None

        def flush():
            nonlocal writer, buf, buf_rows, written_schema
            if not buf:
                return
            tbl = pa.concat_tables(buf)
            if writer is None:
                writer = pq.ParquetWriter(sink, tbl.schema)
                written_schema = tbl.schema
            writer.write_table(tbl, row_group_size=row_group_rows)
            buf, buf_rows = [], 0

        import numpy as _np

        dvs = input_dv_rels or [None] * len(input_rel_paths)
        rmaps = input_rename_maps or [None] * len(input_rel_paths)
        for rel, dv_rel, rmap in zip(input_rel_paths, dvs, rmaps):
            pf = _fs.parquet_file(_fs.join(table_dir, rel))
            pos = None
            if dv_rel:
                from fupi_ray.ops import dv as _dvmod

                pos = _dvmod.read_dv(table_dir, dv_rel)
            rg_offset = 0
            for rg in range(pf.metadata.num_row_groups):
                tbl = pf.read_row_group(rg)
                phys_rows = tbl.num_rows
                if pos is not None and len(pos):
                    plo = _np.searchsorted(pos, rg_offset)
                    phi = _np.searchsorted(pos, rg_offset + phys_rows)
                    local = (pos[plo:phi] - rg_offset).astype(_np.int64)
                    if len(local):
                        keep = _np.ones(phys_rows, dtype=bool)
                        keep[local] = False
                        tbl = tbl.filter(pa.array(keep))
                rg_offset += phys_rows
                if rmap:
                    # renamed columns: the file still carries the old
                    # name (same field id); restore the declared name
                    # BEFORE normalization so the data survives the
                    # rewrite instead of being dropped-and-null-filled
                    tbl = mf.apply_rename(tbl, rmap)
                if declared is not None:
                    tbl = normalize_batch(tbl, declared, fill, drop_extra=True)
                rows += tbl.num_rows
                if tbl.num_rows:
                    for col in mf.zone_columns(tbl.schema):
                        mm = pc.min_max(tbl.column(col))
                        lo, hi = mm["min"].as_py(), mm["max"].as_py()
                        if lo is None or hi is None:
                            continue  # all-null chunk: nulls never match
                        if lo != lo or hi != hi:
                            # NaN in THIS chunk poisons the whole column
                            # for the fragment — Python min/max against
                            # later chunks would otherwise swallow it
                            # depending on chunk order
                            poisoned.add(col)
                            continue
                        mins[col] = lo if col not in mins else min(mins[col], lo)
                        maxs[col] = hi if col not in maxs else max(maxs[col], hi)
                if "n_tok" in tbl.column_names and tbl.num_rows:
                    sum_n_tok += int(pc.sum(tbl.column("n_tok")).as_py() or 0)
                if bloom_bits and "doc_id" in tbl.column_names and tbl.num_rows:
                    from fupi_ray.functions.hashing import stable_hash

                    hash_chunks.append(stable_hash(tbl["doc_id"]))
                buf.append(tbl)
                buf_rows += tbl.num_rows
                if buf_rows >= row_group_rows:
                    flush()
        flush()
        if writer is not None:
            writer.close()
        if uri:
            sink.close()
        else:
            os.replace(tmp, abs_out)
    finally:
        if tmp is not None and os.path.exists(tmp):
            os.unlink(tmp)

    if bloom_bits and hash_chunks:
        import numpy as _np

        from fupi_ray.functions import bloom as _bloom

        _bloom.write_sidecar(abs_out, _np.concatenate(hash_chunks), bloom_bits)

    # stamp the physical column names so the commit can assign field
    # ids (rename_column requires id-stamped fragments); compact
    # normalizes to the declared schema, so declared names are exact
    out_cols = (
        list(declared.names)
        if declared is not None
        else (list(written_schema.names) if written_schema is not None else None)
    )
    meta = FragmentMeta(
        path=rel_out,
        rows=rows,
        bytes=_fs.size(abs_out),
        sum_n_tok=sum_n_tok,
        zone_map={
            c: e
            for c in mins
            if c not in poisoned
            for e in [mf._zone_entry(pa.scalar(mins[c]), pa.scalar(maxs[c]))]
            if e is not None
        },
        cols=out_cols,
        bucket=bucket,  # pack is single-bucket by plan → tag survives
        bucket_sig=bucket_sig,
    )
    lineage.write_record(
        table_dir,
        job_id,
        partition,
        input_fragments=input_rel_paths,
        output_fragments=[meta],
        metrics={
            "seconds": time.perf_counter() - t0,
            "rows": rows,
            "input_dvs": dv_ident,
            "renames": _rename_ident(input_rename_maps),
        },
    )
    return lineage.read_record(table_dir, job_id, partition)


# one repack per Ray task; shared protocols (local, file://, s3://) only
_repack_task = ray.remote(num_cpus=1)(_repack)


def compact(table: Table, job_id: str | None = None) -> int | None:
    """Compact small fragments; returns the new version (None = no-op).

    ``job_id`` names the lineage namespace: re-running with the same
    job_id after a crash skips finished packs and commits the rest.
    """
    cfg = table.config
    parent = table.latest_version()
    m = table.manifest(parent)
    plan = plan_compaction(
        m.fragments, cfg.target_fragment_bytes, cfg.compact_min_fill, cfg.max_rows_per_fragment
    )
    if not plan.packs:
        return None
    job_id = job_id or f"compact-v{parent}"

    task_args = [
        (
            table.table_dir,
            job_id,
            i,
            [f.path for f in p],
            cfg.row_group_rows,
            m.schema_names,
            m.schema_types,
            m.column_defaults,
            cfg.bloom_bits_per_key,
            [f.dv_path for f in p],
            [f.rename_map(m.column_ids) for f in p],
            p[0].bucket,
            p[0].bucket_sig,
        )
        for i, p in enumerate(plan.packs)
    ]
    if _fs.is_process_local(table.table_dir):
        # memory:// lives only in THIS process — worker tasks could
        # neither read the inputs nor make their outputs visible
        records = [_repack(*a) for a in task_args]
    else:
        # capped fan-out: repacks are pure copies that anti-scale past
        # memory-bus saturation (see ops/_fanout.py)
        from fupi_ray.ops import _fanout

        records = _fanout.run_capped(
            _repack_task,
            task_args,
            _fanout.copy_concurrency_cap(cfg.memcpy_max_concurrency),
        )
    new_frags = [fm for rec in records for fm in lineage.output_fragments(rec)]
    removed = {f.path for p in plan.packs for f in p}
    stats = {
        "packs": len(plan.packs),
        "fragments_in": plan.num_input_fragments,
        "fragments_out": len(new_frags),
    }
    return table.commit_fragment_swap(
        removed, new_frags, operation="compact", expected_parent=parent, properties=stats
    )
