"""Job entry points for ``ray job submit`` (north rule: maintenance
jobs launched as Ray jobs on a fixed-size cluster).

    ray job submit -- python -m fupi_ray.cli compact --table /data/seq
    ray job submit -- python -m fupi_ray.cli cluster --table /data/seq --curve hilbert
    ray job submit -- python -m fupi_ray.cli merge --table /data/seq --source /data/updates
    ray job submit -- python -m fupi_ray.cli insert-missing --table /data/seq \
        --source /data/feed   # idempotent ingest: only absent doc_ids land
    ray job submit -- python -m fupi_ray.cli dedup-docs --table /data/seq \
        --threshold 0.7 --mode dv   # near-dup families -> keep min doc_id
    ray job submit -- python -m fupi_ray.cli expire --table /data/seq --keep-last 3
    ray job submit -- python -m fupi_ray.cli ingest --table /data/seq --rows 1000000
    ray job submit -- python -m fupi_ray.cli delete --table /data/seq --where n_tok:<:8
    ray job submit -- python -m fupi_ray.cli delete --table /data/seq \
        --where doc_id:in:doc-1,doc-2 --mode dv   # merge-on-read point delete
    ray job submit -- python -m fupi_ray.cli matview --table /data/seq \
        --view /data/seq_by_source --group-col source --agg n=count --agg tok=sum:n_tok
    ray job submit -- python -m fupi_ray.cli refresh-view --table /data/seq \
        --view /data/seq_by_source
    ray job submit -- python -m fupi_ray.cli fork --table /data/seq \
        --fork-dir /data/seq_dev --name dev   # zero-copy branch
    ray job submit -- python -m fupi_ray.cli drop-fork --table /data/seq \
        --fork-dir /data/seq_dev
    ray job submit -- python -m fupi_ray.cli update --table /data/seq \
        --where source:==:spam --set source=quarantined
    ray job submit -- python -m fupi_ray.cli rollback --table /data/seq --to-version 41
    ray job submit -- python -m fupi_ray.cli changelog --table /data/seq \
        --from-version 41 --output /data/seq_cdc
    ray job submit -- python -m fupi_ray.cli replicate --table /data/seq \
        --replica /data/seq_copy --from-version 41
    ray job submit -- python -m fupi_ray.cli stage --table /data/seq --source /data/batch7
    ray job submit -- python -m fupi_ray.cli publish --table /data/seq --stage-id wap-ab12

This module owns its Ray session (it IS the job script); the library
never does. ``--job-id`` names the lineage namespace, so re-submitting
a failed job with the same id resumes from completed partitions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fupi_ray")
    p.add_argument(
        "op",
        choices=[
            "ingest", "ingest-files", "overwrite", "compact", "cluster", "merge",
            "insert-missing", "dedup-docs", "decontaminate", "expire",
            "scan", "add-column", "drop-column",
            "delete", "update", "rollback", "changelog", "replicate",
            "stage", "publish", "abort-stage", "stages",
            "export", "pack", "matview", "refresh-view",
            "fork", "drop-fork", "merge-fork", "bucket", "constrain", "unconstrain",
            "inspect", "maintain", "fsck", "analyze", "explain",
            "pin", "unpin",
        ],
    )
    p.add_argument("--table", required=True)
    p.add_argument("--source", help="parquet path/dir of the MERGE/overwrite source")
    p.add_argument(
        "--auto-compact",
        action="store_true",
        help="run compaction right after ingest/merge (the reference "
        "compacts after every ingest, fupi/embedders.py:127-128)",
    )
    p.add_argument("--curve", default="zorder", choices=["zorder", "hilbert"])
    p.add_argument("--keep-last", type=int, default=2)
    p.add_argument(
        "--older-than",
        type=float,
        default=None,
        help="expire: keep every version committed within this many "
        "seconds, even past --keep-last (time-based retention)",
    )
    p.add_argument(
        "--threshold",
        type=float,
        default=0.7,
        help="dedup-docs: MinHash-estimated token-gram Jaccard cutoff",
    )
    p.add_argument(
        "--deep",
        action="store_true",
        help="fsck: also verify Parquet footers against the manifest",
    )
    p.add_argument(
        "--incremental",
        action="store_true",
        help="dedup-docs: reuse per-fragment signature sidecars (token "
        "bytes read only for fragments new since the last sweep); "
        "cluster: re-sort only fragments not already carrying this "
        "layout's cluster tag (the appended delta)",
    )
    p.add_argument(
        "--width",
        type=int,
        default=13,
        help="decontaminate: eval n-gram window width in tokens",
    )
    p.add_argument(
        "--dedup-threshold",
        type=float,
        default=None,
        help="maintain: opt into the growth-gated near-dup sweep at "
        "this Jaccard cutoff",
    )
    p.add_argument(
        "--token-blooms",
        action="store_true",
        help="maintain: fill in missing needle-index token-bloom "
        "sidecars (rewritten fragments; a never-indexed table pays a "
        "one-time full build)",
    )
    p.add_argument(
        "--analyze-columns",
        nargs="+",
        default=None,
        help="analyze: columns to sketch (default doc_id source); "
        "maintain: opt into NDV-sidecar upkeep for these columns",
    )
    p.add_argument(
        "--quantile-columns",
        nargs="+",
        default=None,
        help="analyze: numeric columns to quantile-sketch (DDSketch "
        "sidecars; ~1%% relative error, metadata-only estimates)",
    )
    p.add_argument(
        "--quantiles",
        nargs="+",
        type=float,
        default=[0.5, 0.95, 0.99],
        help="analyze: quantiles to report for --quantile-columns",
    )
    p.add_argument(
        "--heavy-hitter-columns",
        nargs="+",
        default=None,
        help="analyze: columns to skew-sketch (Misra-Gries sidecars; "
        "frequent values with guaranteed count bounds, metadata-only)",
    )
    p.add_argument("--rows", type=int, default=100_000, help="ingest: synthetic row count")
    p.add_argument(
        "--files",
        nargs="+",
        default=None,
        help="ingest-files: source files or directories (parquet/jsonl); "
        "already-ingested files are skipped (exactly-once by file)",
    )
    p.add_argument(
        "--format", default="parquet", choices=["parquet", "jsonl", "csv"],
        help="ingest-files: source format",
    )
    p.add_argument(
        "--identity", default="stat", choices=["stat", "path"],
        help="ingest-files: file identity — 'stat' re-ingests a changed "
        "file, 'path' skips any previously seen path",
    )
    p.add_argument(
        "--rows-per-fragment",
        type=int,
        default=None,
        help="ingest: force small fragments (post-ingest small-file state)",
    )
    p.add_argument("--job-id", default=None, help="lineage namespace for resume")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--version", type=int, default=None, help="scan: pin this version")
    p.add_argument("--column", help="add/drop-column: column name")
    p.add_argument("--type", dest="col_type", help="add-column: arrow type (e.g. int64, double, string)")
    p.add_argument("--default", help="add-column: default value for pre-existing rows")
    p.add_argument(
        "--where",
        action="append",
        default=[],
        help="delete/update/scan predicate conjunct, col:op:value "
        "(op in ==,!=,<,<=,>,>=,between,in; between uses lo..hi, in uses a,b,c)",
    )
    p.add_argument(
        "--set",
        action="append",
        default=[],
        dest="assignments",
        help="update: col=value assignment (repeatable)",
    )
    p.add_argument("--stage-id", default=None, help="WAP stage id (stage/publish/abort-stage)")
    p.add_argument("--num-shards", type=int, default=64, help="export: shard count")
    p.add_argument("--context-len", type=int, default=2048, help="pack: tokens per example")
    p.add_argument(
        "--keep-remainder",
        action="store_true",
        help="pack: emit the final short row of each block instead of dropping it",
    )
    p.add_argument("--as-of", type=float, default=None, help="scan: time travel to this unix timestamp")
    p.add_argument("--to-version", type=int, help="rollback target / changelog end version")
    p.add_argument("--from-version", type=int, help="changelog start version")
    p.add_argument("--raw", action="store_true", help="changelog: skip CDC netting")
    p.add_argument("--replica", help="replicate: target table dir (the downstream copy)")
    p.add_argument("--output", help="changelog: write result parquet here")
    p.add_argument(
        "--mode",
        default=None,
        choices=["cow", "dv", "auto"],
        help="delete/update/merge/dedup-docs/decontaminate: cow rewrites "
        "hit fragments; dv records a deletion-vector sidecar "
        "(merge-on-read, O(changed rows) write). Defaults match the "
        "op's API: cow for delete/update/merge, dv for "
        "dedup-docs/decontaminate",
    )
    p.add_argument("--view", help="matview/refresh-view: view table dir")
    p.add_argument("--fork-dir", help="fork/drop-fork/merge-fork: the fork's table dir")
    p.add_argument(
        "--on-conflict", default="error", choices=["error", "fork"],
        help="merge-fork: refuse when both sides changed a key (error) "
        "or let the fork's version win (fork)",
    )
    p.add_argument(
        "--drop", action="store_true",
        help="merge-fork: release the fork's pin on success",
    )
    p.add_argument(
        "--name",
        help="fork: ref name (default: fork dir basename); pin/unpin: tag name",
    )
    p.add_argument("--group-col", help="matview: GROUP BY column")
    p.add_argument(
        "--agg",
        action="append",
        default=[],
        dest="aggs",
        help="matview: out=fn[:src_col] (fn in count,sum,mean,min,max; repeatable)",
    )
    args = p.parse_args(argv)

    def coerce(s: str):
        for f in (int, float):
            try:
                return f(s)
            except ValueError:
                pass
        return s

    def parse_where(specs: list[str]) -> list[tuple]:
        pred = []
        for s in specs:
            col, op, val = s.split(":", 2)
            if op == "between":
                lo, hi = val.split("..", 1)
                pred.append((col, op, (coerce(lo), coerce(hi))))
            elif op == "in":
                pred.append((col, op, [coerce(v) for v in val.split(",")]))
            else:
                pred.append((col, op, coerce(val)))
        return pred

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().use_polars_sort = True

    from fupi_ray import Table
    from fupi_ray.ops import cluster, compact, expire_snapshots, merge_into

    t0 = time.perf_counter()
    out: dict = {"op": args.op, "table": args.table}
    # per-op --mode default: the CLI must match each op's API default
    if args.mode is None:
        args.mode = "dv" if args.op in ("dedup-docs", "decontaminate") else "cow"
    if args.op == "ingest":
        from fupi_ray.fixtures import sequences_dataset

        try:
            t = Table.open(args.table)
        except FileNotFoundError:
            t = Table.create(args.table)
        kw = {}
        if args.rows_per_fragment:
            kw["rows_per_partition"] = args.rows_per_fragment
        v = t.commit_append(sequences_dataset(args.rows, **kw))
        out["version"] = v
        if args.auto_compact:
            out["compacted_version"] = compact(t)
    elif args.op == "ingest-files":
        from fupi_ray.ops import ingest_files

        if not args.files:
            p.error("ingest-files requires --files")
        try:
            t = Table.open(args.table)
        except FileNotFoundError:
            t = Table.create(args.table)
        out.update(
            ingest_files(
                t, args.files, format=args.format, identity=args.identity,
                target_fragment_rows=args.rows_per_fragment,
            )
        )
        if args.auto_compact:
            out["compacted_version"] = compact(t)
    elif args.op == "overwrite":
        # reference S4: create_table(mode="overwrite") — replace table
        # contents from a parquet source (fupi/utils.py:39-49)
        if not args.source:
            p.error("overwrite requires --source")
        import ray.data

        try:
            t = Table.open(args.table)
        except FileNotFoundError:
            t = Table.create(args.table)
        out["version"] = t.commit_overwrite(ray.data.read_parquet(args.source))
    elif args.op == "compact":
        t = Table.open(args.table)
        out["version"] = compact(t, job_id=args.job_id)
    elif args.op == "cluster":
        t = Table.open(args.table)
        out["version"] = cluster(
            t, curve=args.curve, job_id=args.job_id, incremental=args.incremental
        )
    elif args.op == "maintain":
        # policy-driven one-call maintenance: compact → recluster on
        # drift (unless bucketed) → bucket-layout repair → growth-gated
        # near-dup sweep (opt-in) → expire
        from fupi_ray.ops import maintain

        t = Table.open(args.table)
        out.update(
            maintain(
                t,
                keep_last=args.keep_last,
                older_than_seconds=args.older_than,
                dedup_threshold=args.dedup_threshold,
                token_blooms=args.token_blooms,
                analyze_columns=args.analyze_columns,
                quantile_columns=args.quantile_columns,
                job_id=args.job_id,
            )
        )
    elif args.op in ("pin", "unpin"):
        # named snapshot refs (Iceberg-style tags): a pinned version is
        # exempt from expiry, so releases/audits keep a stable view
        if not args.name:
            raise SystemExit(f"{args.op} requires --name")
        t = Table.open(args.table)
        if args.op == "pin":
            out["version"] = t.pin(args.name, args.version)
        else:
            t.unpin(args.name)
        out["pins"] = t.pins()
    elif args.op == "explain":
        # metadata-only plan report for a predicate: what zone maps,
        # bucket tags, bloom sidecars and the cardinality estimate say
        # before any data read, plus the mode="auto" mutation dispatch
        from fupi_ray.ops.analyze import explain_predicate

        t = Table.open(args.table)
        out.update(explain_predicate(t, parse_where(args.where), version=args.version))
    elif args.op == "analyze":
        # NDV column statistics from per-fragment HLL sidecars: the
        # ensure pass pays one column-pruned read per NEW fragment,
        # then the estimate is metadata-only
        from fupi_ray.ops import column_ndv, column_quantiles

        t = Table.open(args.table)
        cols = tuple(args.analyze_columns or ("doc_id", "source"))
        stats: dict = {}
        out["ndv"] = column_ndv(t, columns=cols, stats_out=stats)
        out.update(stats)
        if args.quantile_columns:
            qstats: dict = {}
            out["quantiles"] = column_quantiles(
                t,
                columns=tuple(args.quantile_columns),
                qs=tuple(args.quantiles),
                stats_out=qstats,
            )
            out["quantile_fragments_missing"] = qstats["fragments_missing"]
        if args.heavy_hitter_columns:
            from fupi_ray.ops import column_heavy_hitters

            out["heavy_hitters"] = column_heavy_hitters(
                t, columns=tuple(args.heavy_hitter_columns)
            )
        out["version"] = t.latest_version()
    elif args.op == "inspect":
        # metadata-table summary: snapshot log + per-fragment stats
        # (Table.files / Table.snapshots) + layout/invariant sidecars
        from fupi_ray.ops import read_constraints, read_layout
        from fupi_ray.ops.stage import list_stages

        t = Table.open(args.table)
        files = t.files(args.version)
        out["version"] = args.version if args.version is not None else t.latest_version()
        out["snapshots"] = t.snapshots().to_pylist()
        out["fragments"] = files.num_rows
        out["rows"] = sum(files["live_rows"].to_pylist())
        out["bytes"] = sum(files["bytes"].to_pylist())
        out["dv_rows"] = sum(files["dv_rows"].to_pylist())
        out["bucket_layout"] = read_layout(t)
        out["constraints"] = read_constraints(t.table_dir)
        out["pins"] = t.pins()
        out["stages"] = [r.get("stage_id") for r in list_stages(t)]
        # NDV from existing sidecars only (build=False): inspect stays
        # metadata-cost; un-analyzed fragments are reported, not read
        from fupi_ray.ops import column_ndv

        ndv_stats: dict = {}
        out["ndv"] = column_ndv(
            t,
            columns=("doc_id", "source"),
            version=args.version,
            build=False,
            stats_out=ndv_stats,
        )
        out["ndv_fragments_missing"] = ndv_stats.get("fragments_missing")
        # quantile summary from existing sidecars only — same
        # metadata-cost contract as the NDV line
        from fupi_ray.ops import column_quantiles

        qsk_stats: dict = {}
        try:
            out["n_tok_quantiles"] = column_quantiles(
                t,
                columns=("n_tok",),
                version=args.version,
                build=False,
                stats_out=qsk_stats,
            )["n_tok"]
            out["quantile_fragments_missing"] = qsk_stats.get("fragments_missing")
        except ValueError:
            pass  # table without an n_tok column: nothing to report
        out["files"] = files.to_pylist() if files.num_rows <= 50 else files.slice(0, 50).to_pylist()
    elif args.op in ("constrain", "unconstrain"):
        # commit-time invariants: --where conjuncts become CHECK
        # constraints, --column becomes NOT NULL (ops/constraints.py)
        from fupi_ray.ops import drop_constraints, read_constraints, set_constraints

        t = Table.open(args.table)
        if args.op == "unconstrain":
            drop_constraints(t)
            out["constraints"] = []
        else:
            cons = [
                {"col": c, "op": op, "value": v}
                for c, op, v in parse_where(args.where)
            ]
            if args.column:
                cons.append({"col": args.column, "not_null": True})
            if not cons:
                p.error("constrain requires --where col:op:value and/or --column (not-null)")
            out["rows_verified"] = set_constraints(t, cons)
            out["constraints"] = read_constraints(t.table_dir)
    elif args.op == "bucket":
        # storage-bucketed layout: one all-to-all now, shuffle-free
        # co-partitioned joins forever after (ops/bucket.py)
        from fupi_ray.ops import bucket_table, read_layout

        t = Table.open(args.table)
        out["version"] = bucket_table(
            t, key=args.column or "doc_id", num_buckets=args.num_shards
        )
        out["layout"] = read_layout(t)
    elif args.op == "merge":
        if not args.source:
            p.error("merge requires --source")
        import ray.data

        t = Table.open(args.table)
        src = ray.data.read_parquet(args.source)
        out["version"] = merge_into(t, src, job_id=args.job_id, mode=args.mode)
        if args.auto_compact:
            out["compacted_version"] = compact(t)
    elif args.op == "insert-missing":
        # MERGE WHEN NOT MATCHED INSERT: idempotent ingest — replaying
        # a crashed feed never duplicates rows, never rewrites a
        # fragment
        if not args.source:
            p.error("insert-missing requires --source")
        import ray.data

        from fupi_ray.ops import insert_missing

        t = Table.open(args.table)
        out.update(
            insert_missing(
                t, ray.data.read_parquet(args.source), job_id=args.job_id
            )
        )
    elif args.op == "dedup-docs":
        # near-dup document removal: token-gram MinHash+LSH families,
        # keep min doc_id, MERGE-delete the rest (snapshot-pinned)
        from fupi_ray.ops import dedup_documents

        t = Table.open(args.table)
        out.update(
            dedup_documents(
                t,
                threshold=args.threshold,
                mode=args.mode,
                incremental=args.incremental,
                job_id=args.job_id,
            )
        )
    elif args.op == "fsck":
        # consistency audit: metadata tier by default, --deep adds one
        # Parquet footer read per fragment (capped fan-out)
        from fupi_ray.ops import check_table

        t = Table.open(args.table)
        out.update(check_table(t, deep=args.deep))
    elif args.op == "decontaminate":
        # GPT-3-style n-gram decontamination: --source is the EVAL
        # parquet (tokens list column); contaminated docs MERGE-delete
        if not args.source:
            p.error("decontaminate requires --source (eval parquet)")
        import ray.data

        from fupi_ray.ops import decontaminate_table

        t = Table.open(args.table)
        out.update(
            decontaminate_table(
                t,
                ray.data.read_parquet(args.source),
                width=args.width,
                mode=args.mode,
                job_id=args.job_id,
            )
        )
    elif args.op == "expire":
        t = Table.open(args.table)
        out.update(
            expire_snapshots(
                t, keep_last=args.keep_last, older_than_seconds=args.older_than
            )
        )
    elif args.op in ("add-column", "drop-column"):
        from fupi_ray import manifest as mf_
        from fupi_ray.ops import add_column, drop_column

        if not args.column:
            p.error(f"{args.op} requires --column")
        t = Table.open(args.table)
        if args.op == "add-column":
            if not args.col_type:
                p.error("add-column requires --type")
            default = args.default
            if default is not None:
                import pyarrow as pa_

                typ = mf_.type_from_str(args.col_type)
                if pa_.types.is_integer(typ):
                    default = int(default)
                elif pa_.types.is_floating(typ):
                    default = float(default)
                elif pa_.types.is_boolean(typ):
                    default = default.lower() in ("1", "true", "yes")
            out["version"] = add_column(t, args.column, args.col_type, default=default)
        else:
            out["version"] = drop_column(t, args.column)
    elif args.op == "delete":
        from fupi_ray.ops import delete_where

        if not args.where:
            p.error("delete requires at least one --where col:op:value")
        t = Table.open(args.table)
        out["version"] = delete_where(
            t, parse_where(args.where), job_id=args.job_id, mode=args.mode
        )
        m = t.manifest(out["version"])
        props = m.properties
        if m.operation in ("delete", "delete-dv"):
            out["rows_deleted"] = props.get("rows_matched")
            out["fragments_rewritten"] = props.get("fragments_rewritten")
            out["fragments_dv"] = props.get("fragments_dv")
    elif args.op == "update":
        from fupi_ray.ops import update_where

        if not args.where or not args.assignments:
            p.error("update requires --where and at least one --set col=value")
        t = Table.open(args.table)
        sets = {}
        for a in args.assignments:
            col, val = a.split("=", 1)
            sets[col] = coerce(val)
        out["version"] = update_where(
            t, parse_where(args.where), sets, job_id=args.job_id, mode=args.mode
        )
    elif args.op == "rollback":
        from fupi_ray.ops import rollback

        if args.to_version is None:
            p.error("rollback requires --to-version")
        t = Table.open(args.table)
        out["version"] = rollback(t, args.to_version)
    elif args.op == "changelog":
        from fupi_ray.ops import changelog

        if args.from_version is None:
            p.error("changelog requires --from-version")
        t = Table.open(args.table)
        ds = changelog(t, args.from_version, args.to_version, net=not args.raw)
        if args.output:
            ds = ds.materialize()
            ds.write_parquet(args.output)
            out["output"] = args.output
        counts = (
            ds.groupby("change_type").count().to_pandas().set_index("change_type")["count()"]
            if ds.count()
            else {}
        )
        out["inserts"] = int(counts.get("insert", 0))
        out["deletes"] = int(counts.get("delete", 0))
        out["from_version"] = args.from_version
        out["to_version"] = args.to_version if args.to_version is not None else t.latest_version()
    elif args.op in ("stage", "publish", "abort-stage", "stages"):
        # write-audit-publish: stage a parquet source invisibly, audit
        # (scan --version works on the unchanged table; staged_scan in
        # the library gives the union view), then publish or abort
        from fupi_ray.ops import abort_stage, list_stages, publish_stage, stage_append

        t = Table.open(args.table)
        if args.op == "stage":
            if not args.source:
                p.error("stage requires --source")
            import ray.data

            out["stage_id"] = stage_append(
                t, ray.data.read_parquet(args.source), stage_id=args.stage_id
            )
        elif args.op == "publish":
            if not args.stage_id:
                p.error("publish requires --stage-id")
            out["version"] = publish_stage(t, args.stage_id)
        elif args.op == "abort-stage":
            if not args.stage_id:
                p.error("abort-stage requires --stage-id")
            out["fragments_released"] = abort_stage(t, args.stage_id)
        else:
            out["stages"] = list_stages(t)
    elif args.op == "matview":
        from fupi_ray.ops import create_matview

        if not args.view or not args.group_col or not args.aggs:
            p.error("matview requires --view, --group-col and at least one --agg out=fn[:col]")
        aggs = {}
        for a in args.aggs:
            out_col, spec = a.split("=", 1)
            fn, _, col = spec.partition(":")
            aggs[out_col] = (fn, col)
        t = Table.open(args.table)
        view = create_matview(t, args.view, args.group_col, aggs)
        out["version"] = view.latest_version()
        out["groups"] = view.scan().count()
        out["watermark"] = t.latest_version()
    elif args.op == "refresh-view":
        from fupi_ray.ops import matview_watermark, refresh_matview

        if not args.view:
            p.error("refresh-view requires --view")
        t = Table.open(args.table)
        view = Table.open(args.view)
        out["version"] = refresh_matview(view, t, job_id=args.job_id)
        props = view.manifest(out["version"]).properties
        out["watermark"] = matview_watermark(view)
        out["affected_groups"] = props.get("affected_groups", 0)
        out["rescan"] = props.get("rescan", False)
    elif args.op == "fork":
        from fupi_ray.ops import fork_table

        if not args.fork_dir:
            p.error("fork requires --fork-dir")
        t = Table.open(args.table)
        fork = fork_table(t, args.fork_dir, version=args.version, name=args.name)
        props = fork.manifest().properties
        out["version"] = fork.latest_version()
        out["fork_of"] = props["fork_of"]
        out["fork_version"] = props["fork_version"]
        out["pin"] = props["fork_pin"]
    elif args.op == "drop-fork":
        from fupi_ray.ops import drop_fork

        if not args.fork_dir:
            p.error("drop-fork requires --fork-dir")
        t = Table.open(args.table)
        fork = Table.open(args.fork_dir)
        drop_fork(t, fork)
        out["dropped"] = True
    elif args.op == "merge-fork":
        import os

        from fupi_ray.ops import fork_source, merge_fork

        if not args.fork_dir:
            p.error("merge-fork requires --fork-dir")
        fork = Table.open(args.fork_dir)
        src_dir, _, _ = fork_source(fork)
        if os.path.abspath(args.table) != os.path.abspath(src_dir):
            p.error(f"--table {args.table} is not this fork's source {src_dir}")
        out.update(
            merge_fork(
                fork,
                on_conflict=args.on_conflict,
                drop=args.drop,
                job_id=args.job_id,
            )
        )
    elif args.op == "replicate":
        from fupi_ray.ops import apply_changelog

        if args.from_version is None or not args.replica:
            p.error("replicate requires --from-version and --replica")
        t = Table.open(args.table)
        dst = Table.open(args.replica)
        out["version"] = apply_changelog(
            t, dst, args.from_version, args.to_version, job_id=args.job_id
        )
        props = dst.manifest(out["version"]).properties
        out["cdc_keys"] = props.get("cdc_keys")
        out["cdc_inserts"] = props.get("cdc_inserts")
        out["replica"] = args.replica
    elif args.op == "export":
        from fupi_ray.ops import export_training_shards

        if not args.output:
            p.error("export requires --output")
        t = Table.open(args.table)
        man = export_training_shards(
            t, args.output, args.num_shards, version=args.version
        )
        out["output"] = args.output
        out["num_shards"] = man["num_shards"]
        out["rows"] = man["total_rows"]
        out["tokens"] = man["total_tokens"]
        out["version"] = man["version"]
    elif args.op == "pack":
        # last mile for training: scan → fixed-context packing →
        # partitioned parquet (streams block-by-block, no exchange)
        from fupi_ray.stages.pack import pack_sequences

        if not args.output:
            p.error("pack requires --output")
        from fupi_ray.state import fs as _fsmod

        if _fsmod.ls_names(args.output):
            # same contract as export: rerunning into a used directory
            # would mix stale parts into the dataset and inflate the
            # reported count
            p.error(f"pack --output {args.output} is not empty; use a fresh directory")
        t = Table.open(args.table)
        packed = pack_sequences(
            t.scan(version=args.version),
            args.context_len,
            drop_remainder=not args.keep_remainder,
        )
        packed.write_parquet(args.output)
        out["output"] = args.output
        out["context_len"] = args.context_len
        # row count from the parquet footers of THIS run's files —
        # metadata-only, no second pass over the data
        out["packed_rows"] = sum(
            _fsmod.parquet_file(_fsmod.join(args.output, name)).metadata.num_rows
            for name in _fsmod.ls_names(args.output)
            if name.endswith(".parquet")
        )
    elif args.op == "scan":
        t = Table.open(args.table)
        ds = t.scan(
            version=args.version,
            predicate=parse_where(args.where) or None,
            as_of_unix=args.as_of,
        )
        out["rows"] = ds.count()
        if args.as_of is not None:
            out["version"] = t.version_at(args.as_of)
        else:
            out["version"] = args.version if args.version is not None else t.latest_version()
    out["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out, default=str))
    ray.shutdown()
    # fsck is a canary: corruption findings must fail the job so a
    # scheduler keyed on exit status can alert
    if args.op == "fsck" and not out.get("ok", True):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
