"""Incrementally-maintained materialized views over a table's CDC feed.

The reference recomputes every derived artifact from a full scan
(searcher.py:404-405 re-opens the whole table after any change). A
materialized aggregate over a 10^12-row table cannot be re-derived
per change at that scale — the viable shape is incremental view
maintenance (IVM): consume the netted changelog window and touch only
the GROUPS that changed.

Two maintenance tiers, chosen per aggregate:

- **distributive** (``count``, ``sum``, and ``mean`` derived from
  them): refresh is pure delta arithmetic — inserts add, deletes
  subtract. Cost: O(changelog window) + O(affected groups). The base
  table is NEVER re-read.
- **non-distributive** (``min``, ``max``): a delete can retire the
  current extreme, so affected groups are recomputed from the base
  table through the group-pruned scan. Cost: O(changelog window) +
  O(base rows of affected groups) — still never O(table).

The view is itself a :class:`fupi_ray.table.Table`: refreshes are
atomic commits (upsert keyed on the group column, same shape as
``apply_changelog``), snapshots/pins/time-travel all apply, and the
refresh watermark rides in commit properties — re-running a window is
detected and returns the existing version (exactly-once under retry).

Scale shape: the delta aggregation is a distributed Ray groupby over
the changelog scan; only the per-group RESULTS (bounded by groups
touched in the window, not rows) land on the driver for the upsert.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fupi_ray import manifest as mf
from fupi_ray.config import EngineConfig
from fupi_ray.ops.changelog import CHANGE_COL, changelog
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table, write_dataset_fragments

_SPEC_FILE = "matview.json"
DISTRIBUTIVE = ("count", "sum", "mean")
EXTREMES = ("min", "max")


def _agg_columns(group_col: str, aggs: dict) -> list[str]:
    """Only the group column and the aggregated source columns ever
    need to enter the groupby exchange — the sort-based aggregate
    would otherwise move the tokens payload of the whole table
    (measured 5.4 s vs 0.9 s on the 2M-row bench create)."""
    cols = {group_col}
    for _, (fn, col) in aggs.items():
        if col:
            cols.add(col)
    return sorted(cols)


def _validate(aggs: dict[str, tuple[str, str]]) -> None:
    for out, (fn, col) in aggs.items():
        if fn not in DISTRIBUTIVE + EXTREMES:
            raise ValueError(f"{out}: unsupported aggregate {fn!r}")
        if fn != "count" and not col:
            raise ValueError(f"{out}: {fn} needs a source column")


def _spec_path(view_dir: str) -> str:
    return _fs.join(view_dir, _SPEC_FILE)


def read_spec(view: Table) -> dict:
    return json.loads(_fs.read_text(_spec_path(view.table_dir)))


def _hidden_cols(aggs: dict) -> dict[str, tuple[str, str]]:
    """mean is maintained as hidden sum+count pairs (a mean itself is
    not incrementally combinable); they materialize in the view schema
    prefixed with ``_`` and the visible column is derived on commit."""
    hidden: dict[str, tuple[str, str]] = {}
    for out, (fn, col) in aggs.items():
        if fn == "mean":
            hidden[f"_{out}_sum"] = ("sum", col)
            hidden[f"_{out}_cnt"] = ("count", "")
    return hidden


def _work_aggs(aggs: dict) -> dict[str, tuple[str, str]]:
    """The columns the view PHYSICALLY maintains: visible non-mean
    aggs, the hidden mean pairs, and an always-present hidden ``_rows``
    count — group liveness (drop a group when its row count reaches 0)
    must not depend on the user having asked for a count (a sum-only
    view cannot tell an empty group from a zero-sum one)."""
    work = {k: v for k, v in aggs.items() if v[0] != "mean"}
    work.update(_hidden_cols(aggs))
    work["_rows"] = ("count", "")
    return work


def _aggregate_dataset(
    ds: ray.data.Dataset, group_col: str, aggs: dict
) -> ray.data.Dataset:
    """Distributed grouped aggregation as a DATASET carrying the view's
    output column names — the result never lands on the driver here;
    callers either write it out distributed (create) or pull a
    group-bounded slice (refresh rescan).

    COMBINER SHAPE: every supported aggregate (count/sum/min/max and
    mean's hidden sum+count pair) is decomposable, so each block first
    collapses to per-group PARTIALS with Arrow's C++ ``group_by`` and
    only (blocks × groups) partial rows enter Ray's sort-based groupby
    for the merge (count merges by sum; sum/min/max by themselves).
    Ray's exchange over the raw rows measured 3.4 s on the 2M-row
    bench create; over the partials it is bounded by group count, not
    row count. Aggregate specs are deduplicated by (fn, col): two
    outputs backed by the same physical aggregate (e.g. any count +
    the hidden _rows count) share one partial column."""
    from ray.data.aggregate import Max, Min, Sum

    work = _work_aggs(aggs)
    uniq: dict[tuple[str, str], str] = {}
    for _, (fn, col) in work.items():
        if (fn, col) not in uniq:
            uniq[(fn, col)] = f"_p{len(uniq)}"
    merge_fn = {"count": Sum, "sum": Sum, "min": Min, "max": Max}

    def partial(batch: pa.Table) -> pa.Table:
        specs = [
            ([], "count_all") if fn == "count" else (col, fn)
            for (fn, col) in uniq
        ]
        g = batch.group_by([group_col]).aggregate(specs)
        cols = {group_col: g[group_col]}
        for (fn, col), name in uniq.items():
            cols[name] = g["count_all" if fn == "count" else f"{col}_{fn}"]
        return pa.table(cols)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(*[merge_fn[fn](name) for (fn, _), name in uniq.items()])
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {group_col: batch[group_col]}
        for name, (fn, col) in work.items():
            pname = uniq[(fn, col)]
            cols[name] = batch[f"{merge_fn[fn].__name__.lower()}({pname})"]
        return _finish_means(pa.table(cols), aggs)

    return merged.map_batches(finish, batch_format="pyarrow")


def _aggregate(ds: ray.data.Dataset, group_col: str, aggs: dict) -> pa.Table:
    """Driver-side grouped aggregate — ONLY for group-bounded inputs
    (the refresh rescan path, where the scan is already pruned to the
    affected groups). ``create_matview`` must not route through this."""
    out = _aggregate_dataset(ds, group_col, aggs)
    refs = out.to_arrow_refs()
    tbls = [t for t in ray.get(refs) if t.num_rows] if refs else []
    if not tbls:
        work = _work_aggs(aggs)
        cols: dict[str, list] = {group_col: []}
        for name in work:
            cols[name] = []
        return _finish_means(pa.table(cols), aggs)
    return pa.concat_tables(tbls)


def _finish_means(tbl: pa.Table, aggs: dict) -> pa.Table:
    for out, (fn, _) in aggs.items():
        if fn != "mean":
            continue
        s = pc.cast(tbl[f"_{out}_sum"], pa.float64())
        c = pc.cast(tbl[f"_{out}_cnt"], pa.float64())
        mean = pc.divide(s, c)
        if out in tbl.column_names:
            tbl = tbl.set_column(tbl.column_names.index(out), out, mean)
        else:
            tbl = tbl.append_column(out, mean)
    return tbl


def create_matview(
    src: Table,
    view_dir: str,
    group_col: str,
    aggs: dict[str, tuple[str, str]],
    config: EngineConfig | None = None,
) -> Table:
    """Materialize ``SELECT group_col, aggs... GROUP BY group_col`` as
    a new table and record the source watermark. ``aggs`` maps output
    column name → ``(fn, src_col)`` with fn ∈ {count, sum, mean, min,
    max} (count ignores src_col).

    The initial materialization is fully distributed: the grouped
    aggregate stays a Dataset end-to-end and lands via
    ``commit_append`` (fragments written inside ``map_batches``). The
    only driver-side step is reading the SCHEMA off the materialized
    result — the group rows themselves never cross the driver, so a
    high-cardinality group column (billions of groups at 10^12 rows)
    materializes into object-store blocks that spill, not driver heap.
    """
    _validate(aggs)
    watermark = src.latest_version()
    # materialize() pins the aggregate's output blocks (groups-sized,
    # spillable) so the schema probe and the fragment write below share
    # one execution of the groupby shuffle
    cols = _agg_columns(group_col, aggs)
    mat = _aggregate_dataset(src.scan(columns=cols), group_col, aggs).materialize()
    if mat.count():
        aschema = mat.schema().base_schema
    else:
        # empty source: legacy empty-table shape (null-typed columns)
        aschema = _aggregate(src.scan(columns=cols), group_col, aggs).schema
    names = [group_col] + [n for n in aschema.names if n != group_col]
    schema = pa.schema([(n, aschema.field(n).type) for n in names])
    view = Table.create(view_dir, schema=schema, config=config or src.config)
    _fs.write_text(
        _spec_path(view_dir),
        json.dumps(
            {
                "src_table_dir": src.table_dir,
                "group_col": group_col,
                "aggs": {k: list(v) for k, v in aggs.items()},
            }
        ),
    )
    if mat.count():
        body = mat if list(aschema.names) == names else mat.select_columns(names)
    else:
        body = ray.data.from_arrow(
            pa.table({n: pa.array([], schema.field(n).type) for n in names})
        )
    view.commit_append(body, properties={"matview_watermark": watermark})
    return view


def matview_watermark(view: Table) -> int:
    for h in view.history():  # latest-first
        w = h["properties"].get("matview_watermark")
        if w is not None:
            return int(w)
    raise ValueError(f"{view.table_dir} carries no matview watermark")


def refresh_matview(view: Table, src: Table, job_id: str | None = None) -> int:
    """Advance the view to ``src.latest_version()`` incrementally.

    Distributive-only views never touch the base table: the netted
    changelog window aggregates to per-group deltas (insert +1/＋x,
    delete −1/−x) which are merged into the stored group rows. Views
    with min/max recompute ONLY the affected groups through the
    group-pruned base scan. Both paths land as one atomic upsert
    commit; a re-run of the same window returns the existing version.
    """
    spec = read_spec(view)
    aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
    group_col = spec["group_col"]
    w = matview_watermark(view)
    cur = src.latest_version()
    if cur == w:
        return view.latest_version()
    stamp = f"{src.table_dir.rstrip('/')}@{w}->{cur}"
    for h in view.history():
        if h["properties"].get("matview_refresh") == stamp:
            return h["version"]

    ch = changelog(src, w, cur, net=True).materialize()
    affected = sorted(set(ch.unique(group_col) or [])) if ch.count() else []
    if not affected:
        # nothing changed (or only no-op commits): advance the
        # watermark with a metadata-only commit
        return view.commit_fragment_swap(
            set(),
            [],
            operation="matview_refresh",
            properties={"matview_watermark": cur, "matview_refresh": stamp},
        )

    needs_rescan = any(fn in EXTREMES for fn, _ in aggs.values())
    if needs_rescan:
        # recompute affected groups from the base table (group-pruned)
        base = src.scan(
            columns=_agg_columns(group_col, aggs),
            predicate=[(group_col, "in", affected)],
        )
        new_rows = _aggregate(base, group_col, aggs)
    else:
        # pure delta arithmetic: signed changelog aggregation merged
        # with the stored rows — the base table is never read
        sign_specs = _work_aggs(aggs)

        def signed(batch: pa.Table) -> pa.Table:
            s = pc.if_else(
                pc.equal(batch[CHANGE_COL], "insert"),
                pa.scalar(1, pa.int64()),
                pa.scalar(-1, pa.int64()),
            )
            cols = {group_col: batch[group_col]}
            for out, (fn, col) in sign_specs.items():
                if fn == "count":
                    cols[out] = s
                else:
                    cols[out] = pc.multiply(
                        pc.cast(s, pa.float64()), pc.cast(batch[col], pa.float64())
                    )
            return pa.table(cols)

        from ray.data.aggregate import Sum

        delta_rows = (
            ch.map_batches(signed, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(*(Sum(out) for out in sign_specs))
            .take_all()
        )
        delta = {
            r[group_col]: {out: r[f"sum({out})"] for out in sign_specs}
            for r in delta_rows
        }
        old = (
            view.scan(predicate=[(group_col, "in", affected)])
            .take_all()
        )
        old_by_g = {r[group_col]: r for r in old}
        out_cols: dict[str, list] = {
            c: [] for c in [group_col] + list(sign_specs)
        }
        for g in affected:
            d = delta.get(g, {})
            o = old_by_g.get(g, {})
            merged = {
                out: (o.get(out) or 0) + (d.get(out) or 0) for out in sign_specs
            }
            # a group whose row count reached zero leaves the view
            if merged["_rows"] <= 0:
                continue
            out_cols[group_col].append(g)
            for out in sign_specs:
                out_cols[out].append(merged[out])
        vschema = view.schema()
        arrays = {group_col: pa.array(out_cols[group_col], vschema.field(group_col).type)}
        for out in sign_specs:
            arrays[out] = pa.array(out_cols[out]).cast(vschema.field(out).type)
        new_rows = _finish_means(pa.table(arrays), aggs)

    new_rows = new_rows.select(list(view.schema().names)) if new_rows.num_rows else new_rows

    from fupi_ray.ops.mutate import _plan_mutation

    parent, removed, added, _props = _plan_mutation(
        view, [(group_col, "in", affected)], None, "matview_refresh", job_id
    )
    new_frags = (
        write_dataset_fragments(
            ray.data.from_arrow(new_rows),
            view.table_dir,
            "mv",
            bloom_bits=view.config.bloom_bits_per_key,
            row_group_rows=view.config.row_group_rows,
        )
        if new_rows.num_rows
        else []
    )
    return view.commit_fragment_swap(
        removed,
        added + new_frags,
        operation="matview_refresh",
        expected_parent=parent,
        properties={
            "matview_watermark": cur,
            "matview_refresh": stamp,
            "affected_groups": len(affected),
            "rescan": bool(needs_rescan),
        },
    )
