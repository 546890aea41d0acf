"""Row-level mutations: DELETE WHERE / UPDATE WHERE as zone-map-pruned
copy-on-write fragment rewrites, plus version rollback.

The reference can only mutate a table by full rebuild —
``create_table(mode='overwrite')`` (/root/reference/fupi/utils.py:39-49)
rewrites everything even to touch one row. The lakehouse layer gives
the targeted forms: only fragments whose zone maps can contain a
matching row are rewritten (copy-on-write, per-fragment Ray tasks with
lineage records, so a crashed job resumes without recomputing finished
fragments); everything else is carried by reference in the manifest
swap. ``rollback`` restores an earlier version's fragment list as a
NEW commit — history stays linear and pinned readers are unaffected.

Scale shape: predicate pruning is metadata-only on the driver
(fragment count, not row count); each hit fragment is one independent
task reading/writing exactly one target-sized fragment. No shuffle,
no driver data path.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from fupi_ray import manifest as mf
from fupi_ray.functions import bloom
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.manifest import FragmentMeta, Manifest, fragment_meta_from_table
from fupi_ray.state import commit as commit_mod
from fupi_ray.state import fs as _fs
from fupi_ray.state import lineage
from fupi_ray.table import Table


def _fragment_hit(
    m: Manifest, f: FragmentMeta, predicate: list[tuple], defaults: dict
) -> bool:
    """Can this fragment contain a matching row? Conjuncts on columns
    the file physically carries use its zone map; conjuncts on
    evolution-padded columns evaluate the table default (one scalar —
    every row of the fragment shares it; null never matches)."""
    physical = []
    for col, op, val in predicate:
        if f.has_column(col, m.column_ids):
            physical.append((col, op, val))
            continue
        d = defaults.get(col)
        if d is None:
            return False
        one = pa.table({col: pa.array([d])})
        if not mf.predicate_mask(one, [(col, op, val)])[0].as_py():
            return False
    # bucket-tag exact prune composes with zone maps: a point mutation
    # on a bucketed table touches 1/n of the fragments before blooms
    return mf.fragment_may_match(f, physical) and mf.fragment_bucket_may_match(
        f, physical
    )


def _pad_eval_table(tbl: pa.Table, pad_cols: list[tuple]) -> pa.Table:
    """Attach evolution-padded columns so the predicate (and callable
    assignments) see the same row view a scan would."""
    for name, type_str, dflt in pad_cols:
        if name in tbl.column_names:
            continue
        typ = mf.type_from_str(type_str)
        col = (
            pa.nulls(tbl.num_rows, typ)
            if dflt is None
            else pa.array([dflt] * tbl.num_rows, type=typ)
        )
        tbl = tbl.append_column(name, col)
    return tbl


def _bloom_proves_no_match(
    abs_path: str, predicate: list[tuple], doc_id_kind: str | None
) -> bool:
    """Bloom early-exit for point predicates: any doc_id ==/in conjunct
    whose keys the fragment's sidecar proves absent makes the whole
    conjunction unmatchable — the caller can skip the Parquet read
    entirely (zone maps can't do this on an unclustered table). Keys
    are hashed down the SAME stable_hash path the sidecar builder used
    for the COLUMN (``doc_id_kind`` from the declared schema); a key
    whose Python type doesn't match the column isn't probed — the
    parquet read then raises the same Arrow type error a bloom-less
    fragment would (never a silent skip). No false negatives: a real
    match never skips."""
    point_keys = [
        (list(val) if op == "in" else [val])
        for col, op, val in predicate
        if col == "doc_id" and op in ("=", "==", "in")
    ]
    if not point_keys:
        return False

    def _key_hashes(ks: list):
        arr = np.array(ks)
        if doc_id_kind == "int" and arr.dtype.kind in ("i", "u"):
            return stable_hash(arr)
        if doc_id_kind == "string" and all(isinstance(k, str) for k in ks):
            return stable_hash(arr.astype(object))
        return None

    blob = bloom.read_sidecar(abs_path)
    if blob is None:
        return False
    return any(
        h is not None and not bloom.may_contain_any(blob, h)
        for h in (_key_hashes(ks) for ks in point_keys)
    )


@ray.remote(num_cpus=1)
def _mutate_fragment_task(
    table_dir: str,
    job_id: str,
    frag_idx: int,
    rel_path: str,
    predicate: list[tuple],
    pad_cols: list[tuple],
    assignments: dict[str, tuple] | None,
    bloom_bits: int | None = None,
    mutation_digest: str | None = None,
    doc_id_kind: str | None = None,
    dv_rel: str | None = None,
    recon: dict | None = None,
) -> dict:
    """COW rewrite of one hit fragment. ``assignments`` None = delete
    matching rows; else = replace assigned columns on matching rows
    (value spec ``("scalar", v, type_str)`` or ``("fn", callable,
    type_str)`` — the callable sees the padded row view and returns
    per-row values). An existing deletion vector is applied before the
    predicate and materialized away by the rewrite. Idempotent via
    lineage (resume skips it) — a record is reusable only when it
    covers the SAME input fragment AND the SAME (predicate,
    assignments) digest: a first no-match run at parent v leaves
    records under the default job_id, and a different mutation at the
    same parent must not inherit them as silent no-ops."""
    partition = f"frag-{frag_idx:05d}"
    existing = lineage.read_record(table_dir, job_id, partition)
    if (
        existing is not None
        and existing.get("input_fragments") == [rel_path]
        and existing.get("metrics", {}).get("mutation_digest") == mutation_digest
        and existing.get("metrics", {}).get("input_dv", "") == (dv_rel or "")
    ):
        return existing

    t0 = time.perf_counter()
    abs_path = _fs.join(table_dir, rel_path)

    if _bloom_proves_no_match(abs_path, predicate, doc_id_kind):
        lineage.write_record(
            table_dir,
            job_id,
            partition,
            input_fragments=[rel_path],
            output_fragments=[],
            metrics={
                "seconds": round(time.perf_counter() - t0, 4),
                "rows_matched": 0,
                "unchanged": True,
                "bloom_skip": True,
                "mutation_digest": mutation_digest,
                "input_dv": dv_rel or "",
            },
        )
        return lineage.read_record(table_dir, job_id, partition)

    tbl = _fs.read_parquet_table(abs_path)
    if dv_rel:
        from fupi_ray.ops import dv as _dvmod

        tbl = _dvmod.apply_dv(tbl, _dvmod.read_dv(table_dir, dv_rel))
    recon = recon or {}
    rmap = recon.get("rmap") or {}
    if rmap:
        # renamed columns: restore declared names BEFORE the pad/eval
        # so predicates and assignments address the current schema
        tbl = mf.apply_rename(tbl, rmap)
    ev = _pad_eval_table(tbl, pad_cols)
    mask = mf.predicate_mask(ev, predicate)
    n_match = int(pc.sum(mask).as_py() or 0)

    outputs: list[FragmentMeta] = []
    if n_match == 0:
        out = tbl
        unchanged = True
    elif assignments is None:
        out = tbl.filter(pc.invert(mask))
        unchanged = False
    else:
        out = ev  # padded view: an assigned evolution column becomes physical
        for col, (kind, spec, type_str) in assignments.items():
            typ = mf.type_from_str(type_str)
            if kind == "fn":
                new_vals = spec(ev)
                if not isinstance(new_vals, (pa.Array, pa.ChunkedArray)):
                    new_vals = pa.array(new_vals)
                new_vals = new_vals.cast(typ) if new_vals.type != typ else new_vals
            else:
                new_vals = pa.array([spec] * ev.num_rows, type=typ)
            cur = out.column(col)
            if isinstance(cur, pa.ChunkedArray):
                cur = cur.combine_chunks()
            if cur.type != typ:
                cur = cur.cast(typ)
            updated = pc.if_else(mask, new_vals, cur)
            out = out.set_column(out.column_names.index(col), col, updated)
        unchanged = False

    if not unchanged and out.num_rows:
        prefix = "dl" if assignments is None else "up"
        rel_out = f"data/{prefix}-{job_id}-{frag_idx:05d}.parquet"
        abs_out = _fs.join(table_dir, rel_out)
        _fs.write_parquet(out, abs_out, row_group_size=32 * 1024)
        if bloom_bits and "doc_id" in out.column_names:
            bloom.write_sidecar(abs_out, out["doc_id"], bloom_bits)
        in_types = {
            rmap.get(k, k): v for k, v in (recon.get("col_types") or {}).items()
        }
        # columns the update cast to the declared type are no longer
        # narrow — drop their stale stamp
        for col, (_, _, type_str) in (assignments or {}).items():
            in_types.pop(col, None)
        outputs.append(
            fragment_meta_from_table(out, abs_out, rel_out, col_types=in_types)
        )
    lineage.write_record(
        table_dir,
        job_id,
        partition,
        input_fragments=[rel_path],
        output_fragments=outputs,
        metrics={
            "seconds": round(time.perf_counter() - t0, 4),
            "rows_in": tbl.num_rows,
            "rows_matched": n_match,
            "unchanged": unchanged,
            "mutation_digest": mutation_digest,
            "input_dv": dv_rel or "",
        },
    )
    return lineage.read_record(table_dir, job_id, partition)


def _mutation_prologue(
    table: Table,
    predicate: list[tuple],
    assignments: dict[str, tuple] | None,
    operation: str,
    job_id: str | None,
    marker: str | None = None,
) -> tuple:
    """Shared driver prologue of the COW and DV mutation planners:
    validation, mutation-identity digest, evolution pad spec, zone-map
    + bloom hit pruning, and the doc_id hash kind for bloom probes.

    The mutation's identity: tasks refuse to reuse lineage records
    written by a DIFFERENT predicate/assignment set (a no-match run
    leaves records behind without committing, so records at the same
    parent are not otherwise distinguishable). A CALLABLE assignment
    has no reliable content identity (closure state is invisible to
    __qualname__), so without an explicit job_id it gets a unique
    digest — no reuse, correctness over resume. Passing job_id is the
    user's assertion that the callable is unchanged. ``marker``
    separates planner families (a COW and a DV run at the same parent
    must never share records)."""
    if _fs.is_process_local(table.table_dir):
        raise ValueError(
            f"{operation} rewrites fragments from Ray worker processes; "
            "memory:// is process-local — use a shared protocol"
        )
    if not predicate:
        raise ValueError(f"{operation} requires a predicate (refusing full-table match)")
    parent = table.latest_version()
    m = table.manifest(parent)
    defaults = m.column_defaults
    import hashlib as _hl
    import json as _json
    import uuid as _uuid

    has_callable = any(kind == "fn" for kind, _, _ in (assignments or {}).values())
    spec_ident = [
        [list(p) for p in predicate],
        sorted(
            (k, kind, str(spec) if kind == "scalar" else getattr(spec, "__qualname__", "fn"), ts)
            for k, (kind, spec, ts) in (assignments or {}).items()
        ),
    ]
    if marker:
        spec_ident.insert(0, marker)
    if has_callable and job_id is None:
        spec_ident.append(_uuid.uuid4().hex)  # unique run: never reuse
    mutation_digest = _hl.md5(
        _json.dumps(spec_ident, default=str).encode()
    ).hexdigest()[:16]
    job_id = job_id or f"{operation}-v{parent}-{mutation_digest[:8]}"

    declared = {n: t for n, t in zip(m.schema_names, m.schema_types)}
    for col, _, _ in predicate:
        if declared and col not in declared:
            raise ValueError(f"predicate column {col!r} is not in the table schema")
    # columns the predicate / callable assignments may need that some
    # fragment's FILE lacks (schema evolution): pad spec shipped to tasks
    pad_cols = [
        (c, declared[c], defaults.get(c))
        for c in sorted({p[0] for p in predicate} | set(assignments or ()))
        if c in declared
    ]
    hit = [f for f in m.fragments if _fragment_hit(m, f, predicate, defaults)]
    # declared doc_id type class, so the bloom probe hashes keys down
    # the same path the sidecar builder used for the column
    _doc_t = declared.get("doc_id", "")
    doc_id_kind = (
        "int"
        if _doc_t.startswith(("int", "uint"))
        else ("string" if "string" in _doc_t else None)
    )
    return parent, m, pad_cols, hit, doc_id_kind, mutation_digest, job_id


def _run_mutation(
    table: Table,
    predicate: list[tuple],
    assignments: dict[str, tuple] | None,
    operation: str,
    job_id: str | None,
) -> int:
    parent, removed, added, props = _plan_mutation(
        table, predicate, assignments, operation, job_id
    )
    if not removed and not added:
        return parent
    return table.commit_fragment_swap(
        removed, added, operation=operation, expected_parent=parent, properties=props
    )


def _plan_mutation(
    table: Table,
    predicate: list[tuple],
    assignments: dict[str, tuple] | None,
    operation: str,
    job_id: str | None,
) -> tuple[int, set[str], list[FragmentMeta], dict]:
    """Run the zone-map + bloom pruned COW rewrite WITHOUT committing.
    Returns ``(parent, removed_paths, added_metas, properties)`` —
    empty removed/added when nothing matched. Callers that combine the
    swap with other fragment changes (``apply_changelog``) commit the
    union atomically via ``commit_fragment_swap``."""
    parent, m, pad_cols, hit, doc_id_kind, mutation_digest, job_id = _mutation_prologue(
        table, predicate, assignments, operation, job_id
    )
    if not hit:
        return parent, set(), [], {}

    t0 = time.perf_counter()
    # capped fan-out: COW rewrites are pure copies that anti-scale past
    # memory-bus saturation (see ops/_fanout.py)
    from fupi_ray.ops import _fanout

    records = _fanout.run_capped(
        _mutate_fragment_task,
        [
            (
                table.table_dir, job_id, i, f.path, predicate, pad_cols,
                assignments, table.config.bloom_bits_per_key, mutation_digest,
                doc_id_kind, f.dv_path, mf.frag_recon(f, m.column_ids),
            )
            for i, f in enumerate(hit)
        ],
        _fanout.copy_concurrency_cap(table.config.memcpy_max_concurrency),
    )
    changed = [r for r in records if not r["metrics"].get("unchanged")]
    if not changed:
        return parent, set(), [], {}
    removed = {r["input_fragments"][0] for r in changed}
    # COW output is 1:1 with its input fragment → a bucketed layout
    # (ops/bucket.py) survives the rewrite via the tag — unless the
    # UPDATE reassigns the bucket key itself (rows would change
    # buckets in place), which de-tags the rewritten fragments
    from fupi_ray.ops.bucket import fragment_layout as _fragment_layout

    # derive from FRAGMENT signatures, not the (possibly stale) sidecar
    lay = _fragment_layout(m)
    key_rewritten = bool(lay and assignments and lay["key"] in assignments)
    bucket_of = {f.path: (f.bucket, f.bucket_sig) for f in hit}
    added = []
    for r in changed:
        b, sig = (
            (None, None)
            if key_rewritten
            else bucket_of.get(r["input_fragments"][0], (None, None))
        )
        for fmeta in lineage.output_fragments(r):
            fmeta.bucket, fmeta.bucket_sig = b, sig
            added.append(fmeta)
    rows_matched = sum(r["metrics"].get("rows_matched", 0) for r in changed)
    return (
        parent,
        removed,
        added,
        {
            "predicate": [list(p) for p in predicate],
            "rows_matched": int(rows_matched),
            "fragments_hit": len(hit),
            "fragments_bloom_skipped": sum(
                1 for r in records if r["metrics"].get("bloom_skip")
            ),
            "fragments_rewritten": len(changed),
            "fragments_untouched": len(m.fragments) - len(changed),
            "seconds": round(time.perf_counter() - t0, 3),
        },
    )


def delete_where(
    table: Table,
    predicate: list[tuple],
    job_id: str | None = None,
    mode: str = "cow",
) -> int:
    """DELETE FROM table WHERE <conjunction>; returns the new version
    (parent if nothing matched). ``mode="cow"`` (default) rewrites the
    hit fragments without the matching rows — right when deletes are
    wide. ``mode="dv"`` records the matching row positions in a
    deletion-vector sidecar and leaves the Parquet untouched (merge-on
    -read) — O(deleted rows) written instead of O(fragment bytes),
    right for point/GDPR deletes at scale; compaction or clustering
    later materializes the mask. ``mode="auto"`` dispatches between
    them on the metadata-only match estimate (quantile sidecars /
    zone maps, ops/analyze.py:estimate_rows): at most
    ``config.mutation_auto_dv_fraction`` of the table → DV, wider →
    COW — the decision never reads data. Either way only fragments
    whose zone map (and doc_id bloom) can contain a match are
    touched."""
    if mode == "auto":
        mode = _auto_mutation_mode(table, predicate)
    if mode == "dv":
        return _run_mutation_dv(table, predicate, None, "delete-dv", job_id)
    if mode != "cow":
        raise ValueError(f"unknown delete mode {mode!r} (cow | dv | auto)")
    return _run_mutation(table, predicate, None, "delete", job_id)


def _auto_mutation_mode(table: Table, predicate: list[tuple]) -> str:
    """DV for narrow mutations, COW for wide ones, decided from
    metadata alone. Estimates lean HIGH on sketch-less or DV-carrying
    tables (zone-map upper bounds, physical-row sketches), which
    biases toward COW — the safe side: a needlessly-COW'd narrow
    delete costs one rewrite; a needlessly-DV'd wide delete taxes
    every scan until the next compaction."""
    from fupi_ray.ops.analyze import estimate_rows

    est = estimate_rows(table, predicate)
    if est["total"] == 0:
        return "dv"  # nothing can match; either path is a no-op
    frac = est["estimated"] / est["total"]
    return "dv" if frac <= table.config.mutation_auto_dv_fraction else "cow"


def update_where(
    table: Table,
    predicate: list[tuple],
    assignments: dict[str, Any],
    job_id: str | None = None,
    mode: str = "cow",
) -> int:
    """UPDATE table SET <assignments> WHERE <conjunction>; returns the
    new version. Assignment values are scalars, or callables
    ``fn(batch: pa.Table) -> array`` evaluated per fragment over the
    padded row view (for computed updates like ``n_tok + 7`` — the
    callable returns values for EVERY row; only matching rows take
    them). Assigned columns must already be in the table schema
    (``add_column`` first — an UPDATE never evolves the schema)."""
    m = table.manifest()
    declared = {n: t for n, t in zip(m.schema_names, m.schema_types)}
    specs: dict[str, tuple] = {}
    for col, val in assignments.items():
        if declared and col not in declared:
            raise ValueError(
                f"assigned column {col!r} is not in the table schema — "
                "add_column first (UPDATE never evolves the schema)"
            )
        kind = "fn" if callable(val) else "scalar"
        specs[col] = (kind, val, declared[col])
    if not specs:
        raise ValueError("update_where requires at least one assignment")
    # commit-time invariants: a scalar assignment is exactly checkable
    # up front (one probe row, no task launched). Callable assignments
    # are computed per fragment and are the caller's contract — they
    # are validated only where their rows re-enter through a
    # constrained write path (documented limitation).
    from fupi_ray.ops import constraints as _con

    cons = _con.read_constraints(table.table_dir)
    for con in cons:
        col = con["col"]
        if col in specs and specs[col][0] == "scalar":
            probe = pa.table(
                {col: pa.array([specs[col][1]], type=mf.type_from_str(declared[col]))}
            )
            _con.check_batch(probe, [con])
    if mode == "auto":
        # same metadata-only dispatch as delete_where: narrow → DV
        # (delete-old + insert-new), wide → COW rewrite
        mode = _auto_mutation_mode(table, predicate)
    if mode == "dv":
        # merge-on-read UPDATE = DV-delete the old rows + append the
        # assigned rows as a new fragment; the callable sees only the
        # MATCHED rows' padded view (it returns one value per matched
        # row), unlike COW mode where it sees every row of a fragment
        return _run_mutation_dv(table, predicate, specs, "update-dv", job_id)
    if mode != "cow":
        raise ValueError(f"unknown update mode {mode!r} (cow | dv | auto)")
    return _run_mutation(table, predicate, specs, "update", job_id)


# --- merge-on-read mutations (deletion vectors) -------------------------


@ray.remote(num_cpus=1)
def _dv_mutate_task(
    table_dir: str,
    job_id: str,
    frag_idx: int,
    rel_path: str,
    dv_rel: str | None,
    frag_cols: list[str] | None,
    predicate: list[tuple],
    pad_cols: list[tuple],
    assignments: dict[str, tuple] | None,
    bloom_bits: int | None,
    mutation_digest: str | None,
    doc_id_kind: str | None,
    recon: dict | None = None,
) -> dict:
    """Merge-on-read mutation of one hit fragment: record the matching
    row POSITIONS in a new deletion-vector sidecar instead of
    rewriting the Parquet. DELETE reads only the predicate columns
    (plus n_tok for exact token accounting) — the write is O(deleted
    positions), never O(fragment bytes). UPDATE additionally appends
    the assigned rows as a new fragment (delete-old + insert-new, the
    standard MOR update shape). Idempotent via lineage, keyed on the
    (predicate, assignments) digest AND the input DV — the same file
    under a newer deletion vector is a different logical input."""
    from fupi_ray.ops import dv as _dvmod

    partition = f"frag-{frag_idx:05d}"
    existing = lineage.read_record(table_dir, job_id, partition)
    if (
        existing is not None
        and existing.get("input_fragments") == [rel_path]
        and existing.get("metrics", {}).get("mutation_digest") == mutation_digest
        and existing.get("metrics", {}).get("input_dv", "") == (dv_rel or "")
    ):
        return existing

    t0 = time.perf_counter()
    abs_path = _fs.join(table_dir, rel_path)

    def record(metrics: dict, outputs: list | None = None) -> dict:
        metrics.update(
            {
                "seconds": round(time.perf_counter() - t0, 4),
                "mutation_digest": mutation_digest,
                "input_dv": dv_rel or "",
            }
        )
        lineage.write_record(
            table_dir,
            job_id,
            partition,
            input_fragments=[rel_path],
            output_fragments=outputs or [],
            metrics=metrics,
        )
        return lineage.read_record(table_dir, job_id, partition)

    if _bloom_proves_no_match(abs_path, predicate, doc_id_kind):
        return record({"rows_matched": 0, "unchanged": True, "bloom_skip": True})

    recon = recon or {}
    rmap = recon.get("rmap") or {}
    # DELETE reads just the predicate columns + n_tok; UPDATE needs the
    # full rows (the matched subset becomes a new fragment)
    cols = None
    if assignments is None and frag_cols is not None:
        # frag_cols are PHYSICAL file names; a renamed predicate column
        # matches through the rename map, not the declared name
        need = {c for c, _, _ in predicate} | {"n_tok"}
        cols = [c for c in frag_cols if rmap.get(c, c) in need]
        if not cols:
            # every predicate column is evolution-padded: read one
            # physical column so the row count (and positions) exist
            cols = frag_cols[:1]
    tbl = _fs.read_parquet_table(abs_path, columns=cols)
    if rmap:
        tbl = mf.apply_rename(tbl, rmap)
    ev = _pad_eval_table(tbl, pad_cols)
    mask = mf.predicate_mask(ev, predicate).to_numpy(zero_copy_only=False)
    matched_pos = np.flatnonzero(mask).astype(np.uint64)
    old_pos = (
        _dvmod.read_dv(table_dir, dv_rel)
        if dv_rel
        else np.empty(0, dtype=np.uint64)
    )
    new_pos = np.setdiff1d(matched_pos, old_pos, assume_unique=True)
    if len(new_pos) == 0:
        return record({"rows_matched": 0, "unchanged": True})

    merged = np.union1d(old_pos, new_pos)
    # every physical row deleted (DELETE) or superseded (UPDATE): the
    # old fragment has no live rows left — drop it instead of carrying
    # an all-ones deletion vector
    full_delete = len(merged) == tbl.num_rows
    n_tok_delta = 0
    if "n_tok" in tbl.column_names:
        taken = tbl.column("n_tok").take(pa.array(new_pos.astype(np.int64)))
        n_tok_delta = int(pc.sum(taken).as_py() or 0)

    outputs: list[FragmentMeta] = []
    if assignments is not None:
        sub = ev.take(pa.array(new_pos.astype(np.int64)))
        for col, (kind, spec, type_str) in assignments.items():
            typ = mf.type_from_str(type_str)
            if kind == "fn":
                new_vals = spec(sub)
                if not isinstance(new_vals, (pa.Array, pa.ChunkedArray)):
                    new_vals = pa.array(new_vals)
                new_vals = new_vals.cast(typ) if new_vals.type != typ else new_vals
            else:
                new_vals = pa.array([spec] * sub.num_rows, type=typ)
            sub = sub.set_column(sub.column_names.index(col), col, new_vals)
        rel_out = f"data/ud-{job_id}-{frag_idx:05d}.parquet"
        abs_out = _fs.join(table_dir, rel_out)
        _fs.write_parquet(sub, abs_out, row_group_size=32 * 1024)
        if bloom_bits and "doc_id" in sub.column_names:
            bloom.write_sidecar(abs_out, sub["doc_id"], bloom_bits)
        in_types = {
            rmap.get(k, k): v for k, v in (recon.get("col_types") or {}).items()
        }
        for col in assignments:
            in_types.pop(col, None)  # assigned columns were cast wide
        outputs.append(
            fragment_meta_from_table(sub, abs_out, rel_out, col_types=in_types)
        )

    dv_out = None if full_delete else _dvmod.write_dv(table_dir, rel_path, merged)
    return record(
        {
            "rows_matched": int(len(new_pos)),
            "unchanged": False,
            "dv_path": dv_out,
            "dv_rows_total": int(len(merged)),
            "dv_n_tok_delta": n_tok_delta,
            "full_delete": bool(full_delete),
        },
        outputs,
    )


def _run_mutation_dv(
    table: Table,
    predicate: list[tuple],
    assignments: dict[str, tuple] | None,
    operation: str,
    job_id: str | None,
) -> int:
    """Driver half of the merge-on-read mutation: same zone-map + bloom
    pruning as the COW path, but hit fragments get a NEW deletion
    vector (and, for UPDATE, a small insert fragment) instead of a
    rewrite. The manifest swap replaces the hit fragments' metas with
    DV-carrying copies — old snapshots keep pointing at the old (or
    no) DV, so time travel and pinned readers are untouched."""
    import dataclasses

    parent, m, pad_cols, hit, doc_id_kind, mutation_digest, job_id = _mutation_prologue(
        table, predicate, assignments, operation, job_id, marker="dv"
    )
    if not hit:
        return parent

    t0 = time.perf_counter()
    from fupi_ray.ops import _fanout

    task_args = [
        (
            table.table_dir, job_id, i, f.path, f.dv_path, f.cols,
            predicate, pad_cols, assignments,
            table.config.bloom_bits_per_key, mutation_digest, doc_id_kind,
            mf.frag_recon(f, m.column_ids),
        )
        for i, f in enumerate(hit)
    ]
    if assignments is None:
        # DELETE tasks read predicate columns and write tiny sidecars —
        # not memory-bus-bound copies, no cap needed
        records = ray.get([_dv_mutate_task.remote(*a) for a in task_args])
    else:
        # UPDATE tasks read whole fragments and write replacement rows:
        # the same copy shape the COW path caps at bus saturation
        records = _fanout.run_capped(
            _dv_mutate_task,
            task_args,
            _fanout.copy_concurrency_cap(table.config.memcpy_max_concurrency),
        )
    changed = [
        (f, r) for f, r in zip(hit, records) if not r["metrics"].get("unchanged")
    ]
    if not changed:
        return parent
    removed: set[str] = set()
    added: list[FragmentMeta] = []
    # an UPDATE's insert fragment keeps its source fragment's bucket
    # tag ONLY while the update cannot move rows across buckets — i.e.
    # the table's bucket key is not an assignment target (ops/bucket.py
    # layout survival); reassigning the key de-tags the inserts and
    # bucket_join then refuses until a re-bucket
    from fupi_ray.ops.bucket import fragment_layout as _fragment_layout

    # derive from FRAGMENT signatures, not the (possibly stale) sidecar
    lay = _fragment_layout(m)
    key_rewritten = bool(lay and assignments and lay["key"] in assignments)
    for f, r in changed:
        met = r["metrics"]
        removed.add(f.path)
        if not met.get("full_delete"):
            added.append(
                dataclasses.replace(
                    f,
                    dv_path=met["dv_path"],
                    dv_rows=int(met["dv_rows_total"]),
                    dv_n_tok=f.dv_n_tok + int(met["dv_n_tok_delta"]),
                )
            )
        for fmeta in lineage.output_fragments(r):
            fmeta.bucket = None if key_rewritten else f.bucket
            fmeta.bucket_sig = None if key_rewritten else f.bucket_sig
            added.append(fmeta)
    rows_matched = sum(r["metrics"].get("rows_matched", 0) for _, r in changed)
    return table.commit_fragment_swap(
        removed,
        added,
        operation=operation,
        expected_parent=parent,
        properties={
            "mode": "dv",
            "predicate": [list(p) for p in predicate],
            "rows_matched": int(rows_matched),
            "fragments_hit": len(hit),
            "fragments_bloom_skipped": sum(
                1 for r in records if r["metrics"].get("bloom_skip")
            ),
            "fragments_dv": sum(
                1 for _, r in changed if not r["metrics"].get("full_delete")
            ),
            "fragments_dropped": sum(
                1 for _, r in changed if r["metrics"].get("full_delete")
            ),
            "seconds": round(time.perf_counter() - t0, 3),
        },
    )


def rollback(table: Table, to_version: int) -> int:
    """Restore ``to_version``'s state as a NEW commit (history stays
    linear; nothing is deleted, so pinned readers of intermediate
    versions are unaffected). Refused if any of the target's fragments
    were already GC'd by snapshot expiry."""
    parent = table.latest_version()
    if to_version == parent:
        return parent
    if to_version not in table.versions():
        raise ValueError(f"cannot roll back to missing version v{to_version}")
    target = table.manifest(to_version)
    gone = [
        f.path
        for f in target.fragments
        if not _fs.exists(_fs.join(table.table_dir, f.path))
    ]
    if gone:
        raise ValueError(
            f"cannot roll back to v{to_version}: {len(gone)} fragment(s) "
            f"already GC'd by expiry (first: {gone[0]})"
        )
    cur = table.manifest(parent)
    m = Manifest(
        version=-1,
        parent_version=None,
        operation="rollback",
        schema_names=list(target.schema_names),
        schema_types=list(target.schema_types),
        fragments=list(target.fragments),
        properties={"rollback_of": to_version},
        column_defaults=dict(target.column_defaults),
        # restore the target's field ids verbatim (its fragments carry
        # them) but never rewind the id allocator: ids minted after
        # to_version stay retired so a future add_column can't collide
        # with a column that exists in some historical fragment
        column_ids=dict(target.column_ids),
        next_column_id=max(cur.next_column_id, target.next_column_id),
    )
    return commit_mod.commit(table.table_dir, m, expected_parent=parent)
