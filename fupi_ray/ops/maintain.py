"""One-call policy-driven table maintenance.

The reference hard-codes its maintenance policy inline: compact after
every ingest (fupi/embedders.py:127-128) and never expire anything.
At 100 TB the policy IS the operational surface — a scheduler calls
one idempotent entry point per table per cadence and the engine
decides what's worth doing from manifest metadata alone (no data read
until an action is chosen):

1. **compact** — always offered to the planner; it no-ops unless
   small fragments (or deletion vectors to materialize) exist.
2. **recluster** — only if the table was clustered before AND the
   rows that arrived since the last cluster commit exceed
   ``recluster_fraction`` of the table (a freshly clustered table is
   never re-sorted; a drifted one is). The curve is reused from the
   last cluster commit.
3. **rebucket** — only if a bucket layout exists and some live
   fragment lost its tag (e.g. a raw append): the shuffle-free-join
   contract is repaired with the recorded key/bucket-count.
4. **dedup** (opt-in via ``dedup_threshold``) — near-dup document
   removal, gated on table GROWTH since the last completed sweep
   (``ops/dedupdocs.py`` records every sweep, no-ops included):
   repacks and re-sorts keep the row count and never trigger a
   re-scan.
5. **token blooms** (opt-in via ``token_blooms=True``) — fill in the
   needle-index sidecars for every fragment missing one
   (``ops/tokindex.py``): after this cycle's rewrites that means the
   rewritten fragments, but on a table whose index was never built it
   is a FULL one-time build; no-op on an untouched indexed table.
6. **NDV stats** (opt-in via ``analyze_columns``) — same sidecar
   cadence for the per-fragment distinct-count sketches
   (``ops/analyze.py``), so table-level NDV stays answerable from
   metadata across the maintenance lifecycle.
7. **quantile stats** (opt-in via ``quantile_columns``) — same
   cadence for the per-fragment DDSketch sidecars, keeping
   table-level quantiles metadata-only.
8. **expire** — drop old snapshots per the retention knobs and GC
   unreferenced files.

Ordering matters: compact before recluster (fewer, bigger inputs for
the sort), layout repair after both rewrites, expiry last so every
superseded fragment is GC-eligible in the same call.
"""

from __future__ import annotations

import time

from fupi_ray.table import Table


def maintain(
    table: Table,
    keep_last: int | None = None,
    older_than_seconds: float | None = None,
    recluster_fraction: float = 0.2,
    dedup_threshold: float | None = None,
    dedup_fraction: float = 0.2,
    token_blooms: bool = False,
    analyze_columns: tuple[str, ...] | list[str] | None = None,
    quantile_columns: tuple[str, ...] | list[str] | None = None,
    job_id: str | None = None,
) -> dict:
    """Run whatever maintenance the manifest says the table needs;
    returns a summary of the actions taken (idempotent — a healthy
    table yields an all-no-op summary and no new version)."""
    from fupi_ray.ops import bucket as _bk
    from fupi_ray.ops.cluster import cluster
    from fupi_ray.ops.compact import compact
    from fupi_ray.ops.expire import expire_snapshots

    t0 = time.perf_counter()
    actions: dict = {"compact": None, "recluster": None, "rebucket": None}
    job_id = job_id or f"maintain-v{table.latest_version()}"

    # snapshot the manifest BEFORE compaction: drift is measured
    # against it, because compaction's own outputs are content- and
    # locality-preserving repacks, not drift — counting them would
    # make the recluster decision depend on how many small tail
    # fragments the last cluster happened to emit
    m0 = table.manifest()
    actions["compact"] = compact(table, job_id=f"{job_id}-compact")

    # a bucket layout and a curve-sorted layout are mutually exclusive
    # physical orders; an explicit bucket contract (shuffle-free joins)
    # outranks clustering, so its presence disables the recluster arm
    lay = _bk.read_layout(table)

    # recluster on drift: rows in fragments the last cluster commit
    # did not produce, as a fraction of the table. Header-only reads
    # (no shard member lists) keep the search O(history) cheap, and a
    # version expired by a concurrent expire_snapshots mid-scan is
    # skipped, not fatal (same race as the WAP stamp scan).
    from fupi_ray import manifest as _mf

    last_cluster = None
    if lay is None:
        for v in sorted(table.versions(), reverse=True):
            try:
                props = _mf.read_manifest_header(table.table_dir, v).properties
            except FileNotFoundError:
                continue
            if props.get("curve"):
                last_cluster = (v, props["curve"])
                break
    if last_cluster is not None:
        # drift = rows in fragments not carrying the layout's cluster
        # tag (ops/cluster.py cluster_sig): appends, COW rewrites and
        # compaction repacks drop the tag; DV mutations and untouched
        # fragments keep it. Measured on the PRE-compact manifest (see
        # m0 note above). Tables clustered before the tag existed read
        # as fully drifted and pay one full re-sort, then settle.
        _, curve = last_cluster
        sig = f"{curve}@{table.config.cluster_bits}"
        total = sum(f.live_rows for f in m0.fragments) or 1
        drifted = sum(
            f.live_rows for f in m0.fragments if f.cluster_sig != sig
        )
        if drifted / total > recluster_fraction:
            # incremental: only the drifted fragments are re-sorted —
            # the policy cadence then costs O(delta), not O(table)
            actions["recluster"] = {
                "version": cluster(
                    table,
                    curve=curve,
                    job_id=f"{job_id}-cluster",
                    incremental=True,
                ),
                "drift_fraction": round(drifted / total, 3),
                "curve": curve,
                "incremental": True,
            }
        else:
            actions["recluster"] = {"skipped": True, "drift_fraction": round(drifted / total, 3)}

    # repair a broken bucket layout (raw appends de-tag; DV mutations /
    # compaction / MERGE do not)
    if lay is not None:
        untagged = sum(1 for f in table.manifest().fragments if f.bucket is None)
        if untagged:
            actions["rebucket"] = {
                "version": _bk.bucket_table(
                    table, key=lay["key"], num_buckets=lay["num_buckets"]
                ),
                "untagged_fragments": untagged,
            }
        else:
            actions["rebucket"] = {"skipped": True}

    # near-dup removal (opt-in): detection scans the corpus, so it is
    # gated on GROWTH since the last completed sweep (recorded by the
    # op itself, including no-op sweeps) — a table that merely got
    # repacked or re-sorted since keeps its row count and is not
    # re-scanned. Runs after compact (bigger scan inputs) and before
    # expiry (its superseded fragments GC in the same call).
    if dedup_threshold is not None:
        from fupi_ray.ops.dedupdocs import dedup_documents, read_dedup_check

        import numpy as np

        from fupi_ray.functions.hashing import stable_hash

        chk = read_dedup_check(table)
        m_now = table.manifest()
        cur_rows = sum(f.live_rows for f in m_now.fragments)
        valid = bool(chk) and chk.get("threshold") == dedup_threshold
        path_hashes = chk.get("path_hashes") if valid else None
        if path_hashes is not None:
            # precise gate: rows living in fragments that POSTDATE the
            # last sweep. Survives shrink-then-grow windows a net row
            # count would mask (deletes can't introduce duplicates, so
            # vanished fragments simply drop out of the sum). The one
            # over-trigger: a content-preserving repack (compaction,
            # recluster) renames every path, so the cycle after one
            # re-sweeps once — conservative and cheap (incremental
            # sidecars recompute only the rewritten fragments; a clean
            # corpus commits nothing) — then re-records and settles.
            old = np.array(path_hashes, dtype=np.uint64)
            new_rows = 0
            if m_now.fragments:
                h = stable_hash(
                    np.array([f.path for f in m_now.fragments], dtype=object)
                )
                is_old = np.isin(h, old)
                new_rows = int(
                    sum(
                        f.live_rows
                        for f, o in zip(m_now.fragments, is_old)
                        if not o
                    )
                )
            grown = new_rows / max(cur_rows, 1)
        else:
            # fallback (no recorded path set): net count with shrink
            # re-base — coarser, can under-trigger inside one
            # shrink+grow window, never over a second cycle
            base = chk["live_rows"] if valid else 0
            grown = max(cur_rows - min(base, cur_rows), 0) / max(cur_rows, 1)
        if grown > dedup_fraction:
            # incremental: repeated policy sweeps read token bytes only
            # for fragments that appeared since the last sweep
            actions["dedup"] = dict(
                dedup_documents(
                    table,
                    threshold=dedup_threshold,
                    incremental=True,
                    job_id=f"{job_id}-dedup",
                ),
                grown_fraction=round(grown, 3),
            )
        else:
            actions["dedup"] = {"skipped": True, "grown_fraction": round(grown, 3)}

    # token-index upkeep (opt-in): after the rewrites above, fill in
    # bloom sidecars for whatever fragments now lack one — compaction
    # and reclustering rename every rewritten fragment, so this is
    # exactly "one token pass over the rewritten data" and a no-op on
    # an untouched table. Before expiry so a failed build never blocks
    # GC; superseded sidecars die with their fragments right after.
    if token_blooms:
        from fupi_ray.ops.tokindex import ensure_token_blooms

        actions["token_blooms"] = ensure_token_blooms(table)

    # NDV-statistics upkeep (opt-in): same sidecar cadence as the token
    # blooms — after the rewrites, only fragments now lacking a sketch
    # pay a column-pruned read; no-op on an untouched analyzed table
    if analyze_columns:
        from fupi_ray.ops.analyze import ensure_ndv_sketches

        actions["analyze"] = ensure_ndv_sketches(
            table, columns=tuple(analyze_columns)
        )

    # quantile-sketch upkeep (opt-in): identical cadence — DDSketch
    # sidecars for numeric columns, rebuilt only where rewrites
    # invalidated them, so table-level quantiles stay metadata-only
    if quantile_columns:
        from fupi_ray.ops.analyze import ensure_quantile_sketches

        actions["quantiles"] = ensure_quantile_sketches(
            table, columns=tuple(quantile_columns)
        )

    actions["expire"] = expire_snapshots(
        table, keep_last=keep_last, older_than_seconds=older_than_seconds
    )
    actions["seconds"] = round(time.perf_counter() - t0, 3)
    actions["version"] = table.latest_version()
    return actions
