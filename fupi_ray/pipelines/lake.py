"""Lakehouse maintenance ops exposed as driver-checkable queries.

The engine's primary input is the synthetic sequences table
(fixtures.py), but the driver's oracle runs SQL over the shared
testdata views — so these queries derive a sequences table from
``documents`` deterministically (doc_id → zero-padded string key,
n_tok := n_chars, tokens := splitmix64 PRNG of length n_tok), run a
real maintenance op on a throwaway Table under /tmp, and return the
canonical scan projected to the SQL-expressible columns
``(doc_id, source, n_tok)``. Token-array equality itself (not
SQL-expressible) is asserted by the pytest goldens instead.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import gen_tokens_flat
from fupi_ray.ops import (
    changelog,
    cluster,
    compact,
    delete_where,
    expire_snapshots,
    merge_into,
    rollback,
    update_where,
)
from fupi_ray.table import Table

LAKE_CFG = EngineConfig(target_fragment_bytes=4 * 1024 * 1024)

_DOC_SQL = "'doc-' || lpad(CAST(doc_id AS VARCHAR), 12, '0')"


def _doc_id_str(ids: np.ndarray) -> pa.Array:
    # vectorized 'doc-' || lpad(id, 12, '0'): Arrow kernels end-to-end,
    # no per-row Python (this sits on every lake ingest path)
    digits = pc.utf8_lpad(
        pc.cast(pa.array(np.asarray(ids, dtype=np.int64)), pa.string()),
        width=12,
        padding="0",
    )
    return pc.binary_join_element_wise("doc-", digits, "")


def sequences_batch(
    ids: np.ndarray, n_tok: np.ndarray, source: list[str], salt: int
) -> pa.Table:
    vals, offsets = gen_tokens_flat(ids, n_tok.astype(np.int32), seed=42, salt=salt)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(vals, pa.int32()))
    return pa.table(
        {
            "doc_id": _doc_id_str(ids),
            "tokens": tokens.cast(pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok.astype(np.int32), pa.int32()),
            "source": pa.array(source, pa.string()),
        }
    )


def sequences_from_documents(sf_dir: str, salt: int = 100) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "n_chars"]
    )

    def to_seq(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        return sequences_batch(ids, n, batch["source"].to_pylist(), salt)

    return docs.map_batches(to_seq, batch_format="pyarrow")


def _tmp_table(sf_dir: str, tag: str) -> str:
    h = hashlib.md5(f"{sf_dir}:{tag}".encode()).hexdigest()[:10]
    d = f"/tmp/fupi_ray_lake/{tag}-{h}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def _build(sf_dir: str, tag: str, rows_per_fragment: int = 100) -> Table:
    """Build the documents-derived table in the small-file state
    (one fragment per ~rows_per_fragment rows) so compaction has work."""
    t = Table.create(_tmp_table(sf_dir, tag), config=LAKE_CFG)
    ds = sequences_from_documents(sf_dir)
    t.commit_append(ds, target_fragment_rows=rows_per_fragment)
    return t


def canonical_scan(t: Table, version: int | None = None) -> ray.data.Dataset:
    """SQL-comparable projection of the canonical scan."""

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pc.cast(batch["n_tok"], pa.int64()),
            }
        )

    return t.scan(version, columns=["doc_id", "source", "n_tok"]).map_batches(
        proj, batch_format="pyarrow"
    )


def q_lake_compact(sf_dir: str):
    """S6 compaction as a query: build small-file table → compact →
    canonical scan (content-preserving ⇒ oracle = identity)."""
    t = _build(sf_dir, "compact")
    compact(t)
    return canonical_scan(t)


SQL_LAKE_COMPACT = f"SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok FROM documents"


def q_lake_cluster(sf_dir: str):
    """North-star clustering as a query: Z-order rewrite, then a
    pruned box scan (source equality + n_tok range) — the oracle is
    the WHERE clause; zone-map pruning must not change results."""
    t = _build(sf_dir, "cluster")
    cluster(t, curve="zorder")
    lo, hi = 100, 400
    pred = [("n_tok", "between", (lo, hi))]
    ds = t.scan(predicate=pred, columns=["doc_id", "source", "n_tok"])
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_tok": pc.cast(b["n_tok"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_LAKE_CLUSTER = (
    f"SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok "
    "FROM documents WHERE n_chars BETWEEN 100 AND 400"
)


def q_lake_merge(sf_dir: str):
    """J3 MERGE INTO as a query: updates (doc_id % 3 = 0 → new source
    tag + n_tok + regenerated tokens) and inserts (doc_id % 5 = 0 under
    shifted keys); oracle expresses the upsert in SQL."""
    t = _build(sf_dir, "merge")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_source(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        upd_m = ids % 3 == 0
        ins_m = ids % 5 == 0
        upd = sequences_batch(
            ids[upd_m], n[upd_m] + 7, ["merged"] * int(upd_m.sum()), salt=101
        )
        ins = sequences_batch(
            ids[ins_m] + 1_000_000, n[ins_m] + 3, ["inserted"] * int(ins_m.sum()), salt=102
        )
        both = pa.concat_tables([upd, ins])
        order = pc.cast(pc.utf8_slice_codeunits(both["doc_id"], 4, 99), pa.int64())
        return both.append_column("_src_order", order)

    src = docs.map_batches(mk_source, batch_format="pyarrow")
    merge_into(t, src, strategy="broadcast")
    return canonical_scan(t)


SQL_LAKE_MERGE = f"""
WITH upd AS (
  SELECT {_DOC_SQL} AS doc_id, 'merged' AS source, CAST(n_chars + 7 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 3 = 0),
ins AS (
  SELECT 'doc-' || lpad(CAST(doc_id + 1000000 AS VARCHAR), 12, '0') AS doc_id,
         'inserted' AS source, CAST(n_chars + 3 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 5 = 0),
base AS (
  SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok FROM documents)
SELECT * FROM upd
UNION ALL SELECT * FROM ins
UNION ALL SELECT b.* FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM upd)
"""


def q_lake_merge_dv(sf_dir: str):
    """The same upsert as ``q_lake_merge`` through ``mode="dv"``:
    matched target rows are masked by deletion-vector sidecars instead
    of rewritten — the scan result (and the SQL oracle) must be
    IDENTICAL to the copy-on-write twin while no surviving pre-merge
    Parquet path is rewritten (asserted inline)."""
    t = _build(sf_dir, "merge_dv")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_source(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        upd_m = ids % 3 == 0
        ins_m = ids % 5 == 0
        upd = sequences_batch(
            ids[upd_m], n[upd_m] + 7, ["merged"] * int(upd_m.sum()), salt=101
        )
        ins = sequences_batch(
            ids[ins_m] + 1_000_000, n[ins_m] + 3, ["inserted"] * int(ins_m.sum()), salt=102
        )
        both = pa.concat_tables([upd, ins])
        order = pc.cast(pc.utf8_slice_codeunits(both["doc_id"], 4, 99), pa.int64())
        return both.append_column("_src_order", order)

    src = docs.map_batches(mk_source, batch_format="pyarrow")
    parent_paths = {f.path for f in t.manifest().fragments}
    v = merge_into(t, src, strategy="broadcast", mode="dv")
    m = t.manifest(v)
    surviving = {f.path for f in m.fragments} & parent_paths
    assert surviving, "dv merge rewrote every target fragment"
    assert any(f.dv_path for f in m.fragments), "dv merge wrote no deletion vector"
    return canonical_scan(t)


SQL_LAKE_MERGE_DV = SQL_LAKE_MERGE


def q_lake_merge_delete(sf_dir: str):
    """MERGE ... WHEN MATCHED THEN DELETE as a query: the source is a
    key-only tombstone feed (doc_id % 7 = 0, plus keys that don't
    exist); matched rows vanish via deletion vectors, nothing is
    inserted, unmatched tombstones are ignored. The shuffle strategy is
    forced so the position-join scale path gets a driver-oracle row."""
    t = _build(sf_dir, "merge_del")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def mk_tombstones(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hit = ids[ids % 7 == 0]
        ghost = ids[ids % 11 == 0] + 5_000_000  # never existed
        return pa.table({"doc_id": _doc_id_str(np.concatenate([hit, ghost]))})

    src = docs.map_batches(mk_tombstones, batch_format="pyarrow")
    n_before = t.scan().count()
    v = merge_into(t, src, strategy="shuffle", mode="dv", when_matched="delete")
    m = t.manifest(v)
    assert m.properties["when_matched"] == "delete"
    assert not any("-src" in f.path for f in m.fragments), "tombstone merge inserted rows"
    assert t.scan(v).count() < n_before
    return canonical_scan(t)


SQL_LAKE_MERGE_DELETE = f"""
SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 7 <> 0
"""


def q_lake_rename(sf_dir: str):
    """Metadata-only rename + type widening as a query: build with an
    extra user column ``lang``, rename it to ``language`` (field id
    moves, zero rewrites), widen ``n_tok`` int32 → int64, DELETE by
    the RENAMED column (merge-on-read), then compact — the scan must
    show current names/types over old files, DVs, and rewrites alike."""
    from fupi_ray.ops import rename_column, widen_column

    d = _tmp_table(sf_dir, "rename")
    t = Table.create(d, config=LAKE_CFG)
    base = sequences_from_documents(sf_dir)

    def add_lang(batch: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], 4, 99), pa.int64())
        lang = pc.if_else(
            pc.equal(pc.bit_wise_and(ids, 1), 0), "even", "odd"
        )
        return batch.append_column("lang", lang)

    t.commit_append(
        base.map_batches(add_lang, batch_format="pyarrow"),
        target_fragment_rows=100,
    )
    parent_paths = {f.path for f in t.manifest().fragments}
    rename_column(t, "lang", "language")
    widen_column(t, "n_tok", "int64")
    assert {f.path for f in t.manifest().fragments} == parent_paths, (
        "rename/widen must not rewrite data files"
    )
    delete_where(t, [("language", "==", "odd")], mode="dv")
    compact(t)

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "language": batch["language"],
                "n_tok": batch["n_tok"],  # already int64 via widen
            }
        )

    return t.scan(columns=["doc_id", "language", "n_tok"]).map_batches(
        proj, batch_format="pyarrow"
    )


SQL_LAKE_RENAME = f"""
SELECT {_DOC_SQL} AS doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS language,
       CAST(n_chars AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 2 = 0
"""


def q_lake_evolve(sf_dir: str):
    """Schema evolution as a query: build → metadata-only
    ``add_column('quality', double, default=0.5)`` → MERGE a source
    that carries the new column for doc_id%3 rows (updates) — old
    fragments are NOT rewritten; the scan reconciles them to the
    default. Oracle expresses the same evolution in SQL."""
    from fupi_ray.ops import add_column

    t = _build(sf_dir, "evolve")
    add_column(t, "quality", "double", default=0.5)

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_source(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        m = ids % 3 == 0
        upd = sequences_batch(ids[m], n[m] + 7, ["merged"] * int(m.sum()), salt=104)
        upd = upd.append_column(
            "quality", pa.array(np.round((ids[m] % 100) / 100.0, 2), pa.float64())
        )
        order = pc.cast(pc.utf8_slice_codeunits(upd["doc_id"], 4, 99), pa.int64())
        return upd.append_column("_src_order", order)

    merge_into(t, docs.map_batches(mk_source, batch_format="pyarrow"), strategy="broadcast")

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pc.cast(batch["n_tok"], pa.int64()),
                "quality": pc.cast(batch["quality"], pa.float64()),
            }
        )

    return t.scan(columns=["doc_id", "source", "n_tok", "quality"]).map_batches(
        proj, batch_format="pyarrow"
    )


SQL_LAKE_EVOLVE = f"""
WITH upd AS (
  SELECT {_DOC_SQL} AS doc_id, 'merged' AS source,
         CAST(n_chars + 7 AS BIGINT) AS n_tok,
         CAST(round((doc_id % 100) / 100.0, 2) AS DOUBLE) AS quality
  FROM documents WHERE doc_id % 3 = 0),
base AS (
  SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok,
         CAST(0.5 AS DOUBLE) AS quality
  FROM documents)
SELECT * FROM upd
UNION ALL SELECT b.* FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM upd)
"""


def q_lake_expire(sf_dir: str):
    """Snapshot expiry as a query: build → compact → cluster → expire
    all but the latest; scan must be unchanged (oracle = identity) and
    earlier fragments are GC'd."""
    t = _build(sf_dir, "expire")
    compact(t)
    cluster(t, curve="hilbert")
    expire_snapshots(t, keep_last=1)
    return canonical_scan(t)


SQL_LAKE_EXPIRE = SQL_LAKE_COMPACT


def q_lake_delete(sf_dir: str):
    """DELETE WHERE as a query: zone-map-pruned COW rewrite of only
    the fragments that can contain a match; oracle = the negated
    predicate."""
    t = _build(sf_dir, "delete")
    delete_where(t, [("n_tok", "between", (150, 450))])
    return canonical_scan(t)


SQL_LAKE_DELETE = (
    f"SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok "
    "FROM documents WHERE n_chars < 150 OR n_chars > 450"
)


def q_lake_update(sf_dir: str):
    """UPDATE WHERE as a query: conjunction predicate, scalar
    assignment; untouched fragments carried by reference."""
    t = _build(sf_dir, "update")
    update_where(
        t,
        [("source", "==", "src7"), ("n_tok", "<", 300)],
        {"source": "curated"},
    )
    return canonical_scan(t)


SQL_LAKE_UPDATE = f"""
SELECT {_DOC_SQL} AS doc_id,
       CASE WHEN source = 'src7' AND n_chars < 300 THEN 'curated' ELSE source END AS source,
       CAST(n_chars AS BIGINT) AS n_tok
FROM documents
"""


def q_lake_delete_dv(sf_dir: str):
    """Merge-on-read DELETE as a query: the matching row positions go
    into deletion-vector sidecars (ops/dv.py) and the Parquet files
    stay untouched — write amplification O(deleted rows), the only
    delete shape that stays cheap at 100 TB. The scan result must be
    value-identical to the COW twin (same SQL oracle as lake_delete),
    and the query itself asserts the zero-rewrite property."""
    t = _build(sf_dir, "delete_dv")
    paths_before = {f.path for f in t.manifest().fragments}
    delete_where(t, [("n_tok", "between", (150, 450))], mode="dv")
    m = t.manifest()
    # merge-on-read contract: no fragment was rewritten, only DVs added
    # (fully-deleted fragments may drop out of the manifest)
    assert {f.path for f in m.fragments} <= paths_before, "dv delete must not rewrite"
    assert m.operation == "delete-dv"
    return canonical_scan(t)


SQL_LAKE_DELETE_DV = SQL_LAKE_DELETE


def q_lake_stats(sf_dir: str):
    """Metadata-only aggregates as a query: after a COW DELETE, exact
    COUNT(*)/MIN/MAX of the surviving rows come from the manifest
    alone (``Table.count_rows`` / ``Table.column_range``) — no data
    file is opened. The query asserts the exactness flag inline: COW
    rewrites refresh zone maps, so the bounds are attained, not outer.
    The reference pays a table scan for count_rows (LanceDB walks
    fragment metadata the same way); at 10^12 rows COUNT(*)/MIN/MAX
    must be O(metadata)."""
    import pyarrow as pa

    t = _build(sf_dir, "stats")
    delete_where(t, [("n_tok", "between", (150, 450))])
    r = t.column_range("n_tok")
    assert r["exact"] is True, r  # COW delete keeps zone maps attained
    return pa.table(
        {
            "cnt": pa.array([t.count_rows()], pa.int64()),
            "n_tok_min": pa.array([r["min"]], pa.int64()),
            "n_tok_max": pa.array([r["max"]], pa.int64()),
        }
    )


SQL_LAKE_STATS = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS cnt, "
    "CAST(MIN(n_chars) AS BIGINT) AS n_tok_min, "
    "CAST(MAX(n_chars) AS BIGINT) AS n_tok_max "
    "FROM documents WHERE n_chars < 150 OR n_chars > 450"
)


def q_lake_update_dv(sf_dir: str):
    """Merge-on-read UPDATE as a query: DV-delete the old rows + append
    the assigned rows as a new fragment, one atomic commit. Same SQL
    oracle as the COW update twin."""
    t = _build(sf_dir, "update_dv")
    update_where(
        t,
        [("source", "==", "src7"), ("n_tok", "<", 300)],
        {"source": "curated"},
        mode="dv",
    )
    assert t.manifest().operation == "update-dv"
    return canonical_scan(t)


SQL_LAKE_UPDATE_DV = SQL_LAKE_UPDATE


def q_lake_rollback(sf_dir: str):
    """Rollback as a query: delete + update, then restore the original
    version as a new commit — the scan must be bit-identical to the
    pre-mutation table (oracle = identity)."""
    t = _build(sf_dir, "rollback")
    v1 = t.latest_version()
    delete_where(t, [("n_tok", ">", 300)])
    update_where(t, [("n_tok", "<=", 300)], {"source": "scrambled"})
    rollback(t, v1)
    return canonical_scan(t)


SQL_LAKE_ROLLBACK = SQL_LAKE_COMPACT


def _cdc_mutation_source(batch: pa.Table) -> pa.Table:
    """The canonical mutation batch used by the CDC queries: every
    doc_id % 4 == 0 row becomes an update ('patched', n+5), every
    doc_id % 6 == 0 row spawns an insert at id+2,000,000 ('added',
    n+11)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = batch["n_chars"].to_numpy(zero_copy_only=False)
    upd_m = ids % 4 == 0
    ins_m = ids % 6 == 0
    upd = sequences_batch(
        ids[upd_m], n[upd_m] + 5, ["patched"] * int(upd_m.sum()), salt=105
    )
    ins = sequences_batch(
        ids[ins_m] + 2_000_000, n[ins_m] + 11, ["added"] * int(ins_m.sum()), salt=106
    )
    both = pa.concat_tables([upd, ins])
    order = pc.cast(pc.utf8_slice_codeunits(both["doc_id"], 4, 99), pa.int64())
    return both.append_column("_src_order", order)


def q_lake_matview(sf_dir: str):
    """Incremental materialized view: a grouped count/sum view is
    created at v1, the base table then takes a merge-on-read DELETE and
    a COW UPDATE, and ONE incremental refresh (pure delta arithmetic —
    the query asserts the base table was never re-scanned) must land
    the view exactly where a full GROUP BY over the mutated table
    lands. Oracle = that full GROUP BY."""
    from fupi_ray.ops.matview import create_matview, refresh_matview

    t = _build(sf_dir, "matview")
    view = create_matview(
        t,
        _tmp_table(sf_dir, "matview_view"),
        "source",
        {"n": ("count", ""), "tok_sum": ("sum", "n_tok")},
    )
    delete_where(t, [("n_tok", "between", (150, 450))], mode="dv")
    update_where(t, [("source", "==", "src7"), ("n_tok", "<", 300)], {"source": "curated"})
    refresh_matview(view, t)
    props = view.manifest().properties
    assert props["rescan"] is False, "count/sum view must refresh without a base rescan"

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n": pc.cast(b["n"], pa.int64()),
                "tok_sum": pc.cast(b["tok_sum"], pa.int64()),
            }
        )

    return view.scan(columns=["source", "n", "tok_sum"]).map_batches(
        proj, batch_format="pyarrow"
    )


SQL_LAKE_MATVIEW = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_tok) AS BIGINT) AS tok_sum
FROM (
  SELECT CASE WHEN source = 'src7' AND n_tok < 300 THEN 'curated' ELSE source END AS source,
         n_tok
  FROM (
    SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok
    FROM documents WHERE n_chars < 150 OR n_chars > 450
  )
)
GROUP BY source
"""


def q_lake_fork(sf_dir: str):
    """Zero-copy fork workflow as a query: fork the table (no data
    copied — the query asserts the fork's data dir starts empty),
    mutate the FORK in isolation (merge-on-read delete + COW update),
    then merge the net changes back onto the source via the CDC
    consumer. Oracle = the mutations applied directly."""
    import os

    from fupi_ray.ops import apply_changelog
    from fupi_ray.ops.fork import fork_base_version, fork_table

    t = _build(sf_dir, "fork_src")
    fork = fork_table(t, _tmp_table(sf_dir, "fork_dev"), name="dev")
    assert os.listdir(os.path.join(fork.table_dir, "data")) == [], "fork must be zero-copy"
    delete_where(fork, [("n_tok", "between", (150, 450))], mode="dv")
    update_where(fork, [("source", "==", "src7"), ("n_tok", "<", 300)], {"source": "curated"})
    apply_changelog(fork, t, from_version=fork_base_version(fork))
    return canonical_scan(t)


SQL_LAKE_FORK = f"""
SELECT doc_id,
       CASE WHEN source = 'src7' AND n_tok < 300 THEN 'curated' ELSE source END AS source,
       n_tok
FROM (
  SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok
  FROM documents WHERE n_chars < 150 OR n_chars > 450
)
"""


def q_lake_changelog(sf_dir: str):
    """CDC as a query: MERGE a batch of updates + inserts, then read
    the netted changelog between the two versions — each update
    surfaces as delete(old) + insert(new), each insert as one insert,
    and every copy-on-write carried-over row cancels out."""
    t = _build(sf_dir, "changelog")
    v1 = t.latest_version()
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    merge_into(
        t, docs.map_batches(_cdc_mutation_source, batch_format="pyarrow"), strategy="broadcast"
    )

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pc.cast(batch["n_tok"], pa.int64()),
                "change_type": batch["change_type"],
            }
        )

    return changelog(t, v1, net=True).map_batches(proj, batch_format="pyarrow")


SQL_LAKE_CHANGELOG = f"""
WITH upd AS (
  SELECT {_DOC_SQL} AS doc_id, 'patched' AS source, CAST(n_chars + 5 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 4 = 0),
ins AS (
  SELECT 'doc-' || lpad(CAST(doc_id + 2000000 AS VARCHAR), 12, '0') AS doc_id,
         'added' AS source, CAST(n_chars + 11 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 6 = 0),
old AS (
  SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 4 = 0)
SELECT doc_id, source, n_tok, 'insert' AS change_type FROM upd
UNION ALL SELECT doc_id, source, n_tok, 'insert' FROM ins
UNION ALL SELECT doc_id, source, n_tok, 'delete' FROM old
"""


def q_lake_cdc_apply(sf_dir: str):
    """CDC consumer as a query: mutate a SOURCE table (MERGE updates +
    inserts, then a predicate DELETE), replicate the whole window onto
    an independently-laid-out REPLICA with one atomic
    ``apply_changelog`` commit, and return the replica's canonical
    scan. Oracle = the source's final state in SQL, so the driver
    verifies producer → consumer end-to-end. Exactly-once is asserted
    inline (re-applying the window returns the same version)."""
    from fupi_ray.ops import apply_changelog

    src = _build(sf_dir, "cdcsrc")
    v1 = src.latest_version()
    # replica: identical v1 content (deterministic generator), but its
    # own physical layout — replication must be layout-independent
    dst = Table.create(_tmp_table(sf_dir, "cdcdst"), config=LAKE_CFG)
    dst.commit_append(sequences_from_documents(sf_dir))

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    merge_into(
        src, docs.map_batches(_cdc_mutation_source, batch_format="pyarrow"), strategy="broadcast"
    )
    delete_where(src, [("n_tok", "<", 120)])

    v = apply_changelog(src, dst, from_version=v1)
    again = apply_changelog(src, dst, from_version=v1)
    if again != v:
        raise AssertionError(
            f"re-applying the same CDC window committed v{again} != v{v}"
        )
    if dst.scan(v).count() != src.scan().count():
        raise AssertionError("replica row count diverged from source after apply")
    return canonical_scan(dst)


SQL_LAKE_CDC_APPLY = f"""
WITH upd AS (
  SELECT {_DOC_SQL} AS doc_id, 'patched' AS source, CAST(n_chars + 5 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 4 = 0),
ins AS (
  SELECT 'doc-' || lpad(CAST(doc_id + 2000000 AS VARCHAR), 12, '0') AS doc_id,
         'added' AS source, CAST(n_chars + 11 AS BIGINT) AS n_tok
  FROM documents WHERE doc_id % 6 = 0),
base AS (
  SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok FROM documents),
merged AS (
  SELECT * FROM upd
  UNION ALL SELECT * FROM ins
  UNION ALL SELECT b.* FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM upd))
SELECT doc_id, source, n_tok FROM merged WHERE n_tok >= 120
"""


def q_lake_wap(sf_dir: str):
    """Write–audit–publish as a query: build from the even-doc_id half,
    stage the odd half invisibly, audit (staged view must show the
    union while the table itself is UNCHANGED — both asserted here,
    since invisibility is not SQL-expressible), publish, return the
    final scan. Oracle = the full documents-derived table."""
    from fupi_ray.ops import publish_stage, stage_append
    from fupi_ray.ops.stage import staged_scan

    t = Table.create(_tmp_table(sf_dir, "wap"), config=LAKE_CFG)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "n_chars"]
    )

    def half(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = ids % 2 == parity
            n = batch["n_chars"].to_numpy(zero_copy_only=False)
            src = [s for s, keep in zip(batch["source"].to_pylist(), m) if keep]
            return sequences_batch(ids[m], n[m], src, salt=100)

        return fn

    t.commit_append(docs.map_batches(half(0), batch_format="pyarrow"), target_fragment_rows=100)
    base_rows = t.scan().count()
    sid = stage_append(t, docs.map_batches(half(1), batch_format="pyarrow"))
    # audit: staged view sees the union; the table itself sees nothing
    if t.scan().count() != base_rows:
        raise AssertionError("staged fragments leaked into the table before publish")
    audit_rows = staged_scan(t, sid).count()
    publish_stage(t, sid)
    if t.scan().count() != audit_rows:
        raise AssertionError("published table differs from the audited view")
    return canonical_scan(t)


SQL_LAKE_WAP = SQL_LAKE_COMPACT


def q_lake_timetravel(sf_dir: str):
    """Timestamp time travel as a query: build (v1), DELETE a band
    (v2), then scan ``as_of_unix`` = midpoint of the two commit times —
    the result must be the PRE-delete table (oracle = identity). The
    fn also asserts the latest version really lost the rows, so the
    oracle comparison is meaningful."""
    t = _build(sf_dir, "timetravel")
    v1 = t.latest_version()
    v2 = delete_where(t, [("n_tok", "between", (200, 500))])
    ts1 = t.manifest(v1).created_unix
    ts2 = t.manifest(v2).created_unix
    if not ts1 < ts2:
        raise AssertionError("commit timestamps not monotone")
    if t.scan().count() >= t.scan(v1).count():
        raise AssertionError("delete removed nothing; time travel untestable")
    return canonical_scan(t, version=t.version_at((ts1 + ts2) / 2.0))


SQL_LAKE_TIMETRAVEL = SQL_LAKE_COMPACT

# Motif geometry for q_lake_window_dedup: with windows of _WD_W tokens
# at stride _WD_S, a shared motif of _WD_L = W + 2S tokens planted at a
# stride-aligned offset contributes exactly three duplicated windows
# (relative starts 0, S, 2S) whose merged cut span is the whole motif —
# so the expected n_tok after removal is closed-form in SQL.
_WD_W, _WD_S = 40, 20
_WD_L = _WD_W + 2 * _WD_S


def q_lake_window_dedup(sf_dir: str):
    """Duplicated token-window removal (ops/windowdedup.py) as a
    query: derive the sequences table, plant a shared ``_WD_L``-token
    motif at offset ``_WD_S*(doc_id%3)`` in every 7th sufficiently-long
    row, run ``dedup_token_windows`` (detection exchange → span
    assembly → enrich-join rewrite → MERGE update), and return the
    canonical scan. Every planted row except the corpus-first loses
    exactly the motif span; token-array equality is asserted by
    tests/test_windowdedup.py, the oracle checks the n_tok arithmetic."""
    from fupi_ray.ops.windowdedup import dedup_token_windows

    motif, _ = gen_tokens_flat(
        np.array([10**9], dtype=np.int64),
        np.array([_WD_L], dtype=np.int32),
        seed=42,
        salt=999,
    )

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )

    def to_planted(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        tbl = sequences_batch(ids, n, batch["source"].to_pylist(), salt=100)
        toks = tbl["tokens"].combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        o = _WD_S * (ids % 3)
        aff = (ids % 7 == 0) & (n >= o + _WD_L)
        if not aff.any():
            return tbl
        vals = toks.values.to_numpy(zero_copy_only=False).copy()
        starts = offs[:-1][aff] + o[aff]
        idx = (starts[:, None] + np.arange(_WD_L, dtype=np.int64)[None, :]).ravel()
        vals[idx] = np.tile(motif, int(aff.sum()))
        planted = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vals, pa.int32())
        )
        return tbl.set_column(
            tbl.column_names.index("tokens"), "tokens", planted
        )

    t = Table.create(_tmp_table(sf_dir, "windedup"), config=LAKE_CFG)
    t.commit_append(
        docs.map_batches(to_planted, batch_format="pyarrow"),
        target_fragment_rows=100,
    )
    dedup_token_windows(t, width=_WD_W, stride=_WD_S)
    return canonical_scan(t)


SQL_LAKE_WINDOW_DEDUP = f"""
WITH aff AS (
  SELECT doc_id FROM documents
  WHERE doc_id % 7 = 0 AND n_chars >= {_WD_S} * (doc_id % 3) + {_WD_L}),
fst AS (SELECT min(doc_id) AS m FROM aff)
SELECT {_DOC_SQL} AS doc_id, source,
       CAST(CASE WHEN doc_id % 7 = 0
                  AND n_chars >= {_WD_S} * (doc_id % 3) + {_WD_L}
                  AND doc_id <> (SELECT m FROM fst)
             THEN n_chars - {_WD_L} ELSE n_chars END AS BIGINT) AS n_tok
FROM documents
"""


def q_pack_tokens(sf_dir: str):
    """Sequence packing as a query: derive the sequences table, pack
    each source's token stream into context_len=512 examples
    (grouped mode → counts are blocking-independent), and return
    per-source (packed_rows, emitted_tok, input_tok). The fn asserts
    the non-SQL-expressible invariants (every full row is exactly 512
    tokens; emitted == rows*512); the oracle checks the packing math
    against SUM(n_chars) arithmetic."""
    from fupi_ray.stages.pack import pack_sequences

    seqs = sequences_from_documents(sf_dir)
    packed = pack_sequences(seqs, 512, drop_remainder=True, by="source")

    def agg(batch: pa.Table) -> pa.Table:
        n = batch["n_tok"].to_numpy(zero_copy_only=False)
        if len(n) and (n != 512).any():
            raise AssertionError("drop_remainder row with n_tok != context_len")
        import pandas as pd

        df = pd.DataFrame(
            {"source": batch["source"].to_pylist(), "n": n.astype("int64")}
        )
        g = df.groupby("source")["n"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "packed_rows": pa.array(g["count"], pa.int64()),
                "emitted_tok": pa.array(g["sum"], pa.int64()),
            }
        )

    part = packed.map_batches(agg, batch_format="pyarrow")
    out = part.groupby("source").sum(["packed_rows", "emitted_tok"])
    return out.map_batches(
        lambda b: pa.table(
            {
                "source": b["source"],
                "packed_rows": b["sum(packed_rows)"],
                "emitted_tok": b["sum(emitted_tok)"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_PACK_TOKENS = """
SELECT source,
       CAST(SUM(n_chars) // 512 AS BIGINT) AS packed_rows,
       CAST((SUM(n_chars) // 512) * 512 AS BIGINT) AS emitted_tok
FROM documents GROUP BY source
HAVING SUM(n_chars) >= 512  -- a source that packs to zero rows emits no row
"""


def q_export_shards(sf_dir: str):
    """Training-shard export as a query: build the documents-derived
    table, export 8 shards with a DuckDB-reproducible assignment
    (numeric id suffix % 8), and return the export manifest's
    per-shard (rows, token sum). The fn also asserts the exported
    files round-trip: reading every shard back re-counts the table."""
    from fupi_ray.ops import export_training_shards

    t = _build(sf_dir, "export")
    out_dir = _tmp_table(sf_dir, "export-out")

    def by_suffix(ids: pa.Array) -> np.ndarray:
        return (
            pc.cast(pc.utf8_slice_codeunits(ids, 4, 99), pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    man = export_training_shards(t, out_dir, 8, assign=by_suffix)
    back = ray.data.read_parquet(out_dir)
    if back.count() != t.scan().count():
        raise AssertionError("exported shards do not round-trip the table")
    # SQL GROUP BY emits no row for an empty residue class; match it
    shards = [s for s in man["shards"] if s["rows"] > 0]
    return ray.data.from_arrow(
        pa.table(
            {
                "shard": pa.array([s["shard"] for s in shards], pa.int64()),
                "n_rows": pa.array([s["rows"] for s in shards], pa.int64()),
                "sum_tok": pa.array([s["sum_n_tok"] for s in shards], pa.int64()),
            }
        )
    )


SQL_EXPORT_SHARDS = """
SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_tok
FROM documents GROUP BY 1
"""


def q_lake_bucket_join(sf_dir: str):
    """Storage-partitioned (bucketed) join: hash-bucket two tables by
    doc_id once, then join them with NO exchange — one task per bucket
    reads both sides' co-bucket fragments and joins in memory
    (ops/bucket.py). A DV delete runs between bucketing and the join to
    prove the layout (and its masks) survive merge-on-read maintenance.
    """
    from fupi_ray.ops import bucket_join, bucket_table

    left = _build(sf_dir, "bkj-l")
    bucket_table(left, key="doc_id", num_buckets=8)
    # merge-on-read delete on the bucketed table: tags survive via
    # dataclasses.replace; bucket_join must apply the masks
    delete_where(left, [("source", "==", "src3")], mode="dv")

    right = Table.create(
        _tmp_table(sf_dir, "bkj-r"),
        schema=pa.schema([("doc_id", pa.string()), ("lang", pa.string())]),
        config=LAKE_CFG,
    )
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def to_right(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["n_chars"], 200)
        sub = batch.filter(keep)
        ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": _doc_id_str(ids), "lang": sub["lang"]})

    right.commit_append(
        docs.map_batches(to_right, batch_format="pyarrow"), target_fragment_rows=100
    )
    bucket_table(right, key="doc_id", num_buckets=8)

    ds = bucket_join(
        left,
        right,
        on="doc_id",
        columns_left=["doc_id", "source", "n_tok"],
        columns_right=["doc_id", "lang"],
        how="inner",
    )
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_tok": pc.cast(b["n_tok"], pa.int64()),
                "lang": b["lang"],
            }
        ),
        batch_format="pyarrow",
    )


def q_lake_sorted_scan(sf_dir: str):
    """Order-proving sorted scan: the ingest stream is doc_id-ordered,
    so fragment zone maps are pairwise disjoint and ``scan_sorted``
    replaces the all-to-all sort with per-fragment local sorts +
    order-preserving concat (Table.order_proof). Self-asserting: the
    query fails if the proof unexpectedly degrades to the sort
    fallback. A DV delete runs first so the ordered read path also
    proves it honors merge-on-read masks."""
    t = _build(sf_dir, "sorted")
    delete_where(t, [("source", "==", "src7")], mode="dv")
    proof = t.order_proof("doc_id")
    assert proof["provable"], f"expected provable layout, got {proof}"
    ds = t.scan_sorted("doc_id", columns=["doc_id", "source", "n_tok"])
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_tok": pc.cast(b["n_tok"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_LAKE_SORTED_SCAN = (
    f"SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok "
    "FROM documents WHERE source <> 'src7'"
)


SQL_LAKE_BUCKET_JOIN = f"""
SELECT {_DOC_SQL} AS doc_id, l.source, CAST(l.n_chars AS BIGINT) AS n_tok, r.lang
FROM documents l
JOIN (SELECT doc_id, lang FROM documents WHERE n_chars >= 200) r USING (doc_id)
WHERE l.source <> 'src3'
"""


def flagship(sf_dir: str) -> ray.data.Dataset:
    """The full maintenance cycle on one table: ingest (small files) →
    compact → Z-order cluster → MERGE → expire → final canonical scan.
    This is ``__ray_entry__.entry()``."""
    t = _build(sf_dir, "flagship")
    compact(t)
    cluster(t, curve="zorder")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_upd(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        m = ids % 7 == 0
        upd = sequences_batch(ids[m], n[m] + 1, ["refresh"] * int(m.sum()), salt=103)
        order = pc.cast(pc.utf8_slice_codeunits(upd["doc_id"], 4, 99), pa.int64())
        return upd.append_column("_src_order", order)

    merge_into(t, docs.map_batches(mk_upd, batch_format="pyarrow"))
    expire_snapshots(t, keep_last=2)
    return canonical_scan(t)


def q_lake_insert_missing(sf_dir: str):
    """MERGE ... WHEN NOT MATCHED THEN INSERT as a query
    (``ops.insert_missing`` — idempotent ingest): the source re-offers
    every ``doc_id % 4 == 0`` key with CHANGED payload (must be
    skipped, target rows byte-untouched) plus genuinely new shifted
    keys (``doc_id % 7 == 0`` → +2,000,000, tag 'ingested'). Asserts
    the insert-only contract inline: every pre-op fragment survives
    unrewritten. Oracle: base ∪ (new keys) — the matched half of the
    source simply vanishes."""
    from fupi_ray.ops import insert_missing

    t = _build(sf_dir, "insmiss")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_source(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        dup_m = ids % 4 == 0
        new_m = ids % 7 == 0
        dup = sequences_batch(
            ids[dup_m], n[dup_m] + 9, ["dup"] * int(dup_m.sum()), salt=103
        )
        new = sequences_batch(
            ids[new_m] + 2_000_000, n[new_m] + 5, ["ingested"] * int(new_m.sum()), salt=104
        )
        return pa.concat_tables([dup, new])

    parent_paths = {f.path for f in t.manifest().fragments}
    res = insert_missing(t, docs.map_batches(mk_source, batch_format="pyarrow"))
    m = t.manifest(res["version"])
    assert parent_paths <= {f.path for f in m.fragments}, (
        "insert_missing must never rewrite or drop an existing fragment"
    )
    assert res["rows_inserted"] > 0 and res["rows_skipped"] > 0
    return canonical_scan(t)


SQL_LAKE_INSERT_MISSING = f"""
SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok FROM documents
UNION ALL
SELECT 'doc-' || lpad(CAST(doc_id + 2000000 AS VARCHAR), 12, '0') AS doc_id,
       'ingested' AS source, CAST(n_chars + 5 AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 7 = 0
"""


def q_lake_dedup_docs(sf_dir: str):
    """Near-dup document removal as a query (``ops.dedup_documents``):
    the table's token content is a function of ``doc_id % 200`` only,
    so every residue class is one exact-duplicate family (Jaccard 1 —
    the op's near-dup machinery must find it) and the canonical
    survivor is the class minimum. Distinct classes are independent
    PRNG streams (Jaccard ~0 — the verifier must reject any band
    collision). Oracle: one row per class minimum, closed-form n_tok."""
    from fupi_ray.ops import dedup_documents

    t = Table.create(_tmp_table(sf_dir, "dedupdocs"), config=LAKE_CFG)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        g = (ids % 200).astype(np.int64)
        n = (20 + g % 40).astype(np.int32)
        vals, offsets = gen_tokens_flat(g, n, seed=42, salt=105)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(vals, pa.int32())
        )
        return pa.table(
            {
                "doc_id": _doc_id_str(ids),
                "tokens": tokens.cast(pa.list_(pa.int32())),
                "n_tok": pa.array(n, pa.int32()),
                "source": batch["source"],
            }
        )

    t.commit_append(docs.map_batches(mk, batch_format="pyarrow"),
                    target_fragment_rows=100)
    before = t.scan().count()
    res = dedup_documents(t, threshold=0.8)
    assert res["rows_deleted"] > 0 and res["version"] == t.latest_version()
    assert t.scan().count() == before - res["rows_deleted"]
    return canonical_scan(t)


SQL_LAKE_DEDUP_DOCS = f"""
SELECT {_DOC_SQL} AS doc_id, source,
       CAST(20 + (doc_id % 200) % 40 AS BIGINT) AS n_tok
FROM documents
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY doc_id % 200)
"""


def q_lake_decontaminate(sf_dir: str):
    """Benchmark decontamination as a query
    (``ops.decontaminate_table``): every ``doc_id % 5 == 0`` document
    carries a planted 13-token eval motif at position 0; the op must
    delete exactly those (the motif constants sit outside the PRNG
    vocabulary, so a false hit would need a 64-bit hash collision).
    Oracle: the untouched 4/5 of the table, closed-form n_tok."""
    from fupi_ray.ops import decontaminate_table

    MOTIF = list(range(70_001, 70_014))
    t = Table.create(_tmp_table(sf_dir, "decon"), config=LAKE_CFG)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = (16 + batch["n_chars"].to_numpy(zero_copy_only=False) % 50).astype(
            np.int32
        )
        vals, offsets = gen_tokens_flat(ids, n, seed=42, salt=106)
        planted = np.nonzero(ids % 5 == 0)[0]
        if len(planted):
            pos = offsets[planted][:, None] + np.arange(13, dtype=np.int64)[None, :]
            vals[pos.reshape(-1)] = np.tile(
                np.array(MOTIF, dtype=vals.dtype), len(planted)
            )
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(vals, pa.int32())
        )
        return pa.table(
            {
                "doc_id": _doc_id_str(ids),
                "tokens": tokens.cast(pa.list_(pa.int32())),
                "n_tok": pa.array(n, pa.int32()),
                "source": batch["source"],
            }
        )

    t.commit_append(docs.map_batches(mk, batch_format="pyarrow"),
                    target_fragment_rows=100)
    eval_ds = ray.data.from_arrow(
        pa.table({"tokens": pa.array([MOTIF], pa.list_(pa.int32()))})
    )
    res = decontaminate_table(t, eval_ds, width=13)
    assert res["rows_deleted"] > 0 and res["version"] == t.latest_version()
    return canonical_scan(t)


SQL_LAKE_DECONTAMINATE = f"""
SELECT {_DOC_SQL} AS doc_id, source,
       CAST(16 + n_chars % 50 AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 5 <> 0
"""


def q_lake_ingest(sf_dir: str):
    """Exactly-once file-level ingestion as a query (``ops.
    ingest_files`` — the COPY INTO shape): a landing directory of 3
    parquet files loads once; re-offering the whole directory is a
    no-op (asserted inline: zero files ingested, version unchanged); a
    late-arriving 4th file (doc_id % 5 == 0 shifted +3,000,000, tag
    'late') is the only thing the third call picks up. Oracle: base ∪
    the late file — the re-offered files contribute nothing twice."""
    import pyarrow.parquet as pq

    from fupi_ray.ops import ingest_files

    landing = _tmp_table(sf_dir, "ingfiles-landing")
    os.makedirs(landing, exist_ok=True)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )
    ids = docs["doc_id"].to_numpy()
    n = docs["n_chars"].to_numpy()
    src = docs["source"].to_pylist()
    for part in range(3):
        m = ids % 3 == part
        batch = sequences_batch(ids[m], n[m], [s for s, k in zip(src, m) if k], salt=100)
        pq.write_table(batch, os.path.join(landing, f"part-{part}.parquet"))

    t = Table.create(_tmp_table(sf_dir, "ingfiles"), config=LAKE_CFG)
    r1 = ingest_files(t, landing)
    assert r1["files_ingested"] == 3, r1
    r2 = ingest_files(t, landing)
    assert r2["files_ingested"] == 0 and r2["version"] == r1["version"], r2

    late_m = ids % 5 == 0
    late = sequences_batch(
        ids[late_m] + 3_000_000, n[late_m] + 3, ["late"] * int(late_m.sum()), salt=106
    )
    pq.write_table(late, os.path.join(landing, "part-late.parquet"))
    r3 = ingest_files(t, landing)
    assert r3["files_ingested"] == 1 and r3["files_skipped"] == 3, r3
    return canonical_scan(t)


SQL_LAKE_INGEST = f"""
SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok FROM documents
UNION ALL
SELECT 'doc-' || lpad(CAST(doc_id + 3000000 AS VARCHAR), 12, '0') AS doc_id,
       'late' AS source, CAST(n_chars + 3 AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 5 = 0
"""


def q_lake_keyword_index(sf_dir: str):
    """Needle-token lookup through the per-fragment token blooms
    (``ops.keyword_lookup``): a motif token is planted only in the
    lowest tenth of the id range (``doc_id <= max(doc_id) // 10``), so
    the probe must return exactly those — and, since the table's
    fragments cover contiguous id ranges, the bloom probe must open
    FEWER fragments than the table holds (asserted inline). An
    absent-token probe must come back empty. Oracle: the planted
    predicate."""
    import pyarrow.parquet as pq

    from fupi_ray.ops import keyword_lookup

    MOTIF = 9_100_001
    t = Table.create(_tmp_table(sf_dir, "tokindex"), config=LAKE_CFG)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    cut = int(pq.read_table(doc_path, columns=["doc_id"])["doc_id"].to_numpy().max()) // 10
    docs = ray.data.read_parquet(
        doc_path, columns=["doc_id", "source", "n_chars"]
    )

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        out = sequences_batch(ids, n, batch["source"].to_pylist(), salt=100)
        # plant the motif as the FIRST token of every row under the cut
        # (guard zero-length rows: their start offset is the NEXT row's)
        toks = out["tokens"].combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False).copy()
        hit = np.nonzero((ids <= cut) & (n > 0))[0]
        flat[offs[hit]] = MOTIF
        planted = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.int32())
        )
        return out.set_column(
            out.schema.get_field_index("tokens"), "tokens",
            planted.cast(pa.list_(pa.int32())),
        )

    t.commit_append(docs.map_batches(mk, batch_format="pyarrow"),
                    target_fragment_rows=100)
    stats: dict = {}
    hits = keyword_lookup(
        t, [MOTIF], columns=["doc_id", "source", "n_tok"], stats_out=stats
    )
    assert 0 < stats["fragments_scanned"] < stats["fragments_total"], stats
    miss = keyword_lookup(t, [9_999_999], columns=["doc_id"]).take_all()
    assert miss == [], miss

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pc.cast(batch["n_tok"], pa.int64()),
            }
        )

    return hits.map_batches(proj, batch_format="pyarrow")


SQL_LAKE_KEYWORD_INDEX = f"""
SELECT {_DOC_SQL} AS doc_id, source, CAST(n_chars AS BIGINT) AS n_tok
FROM documents WHERE doc_id <= (SELECT max(doc_id) // 10 FROM documents)
"""


def q_lake_fork_merge(sf_dir: str):
    """Branch workflow as a query (``ops.fork_table`` + ``ops.
    merge_fork``): fork the table zero-copy, retag the long tail and
    append a branch-only batch ON THE FORK (source untouched — asserted
    inline), then merge back; the conflict detector must also refuse a
    both-sides edit before the fork-wins override is requested. Oracle:
    the source after the merge — retagged tail ∪ branch rows."""
    from fupi_ray.ops import ForkConflict, fork_table, merge_fork, update_where

    t = _build(sf_dir, "forkmerge")
    before = t.latest_version()
    fork = fork_table(t, _tmp_table(sf_dir, "forkmerge-dev"), name="dev")
    update_where(fork, [("n_tok", ">", 300)], {"source": "branch-tag"})
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def mk_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        m = ids % 11 == 0
        return sequences_batch(
            ids[m] + 4_000_000, n[m] + 1, ["branch"] * int(m.sum()), salt=107
        )

    fork.commit_append(docs.map_batches(mk_new, batch_format="pyarrow"))
    assert t.latest_version() == before, "fork edits must not touch the source"

    # a source-side edit on overlapping keys must REFUSE by default
    update_where(t, [("n_tok", ">", 450)], {"source": "src-tag"})
    try:
        merge_fork(fork)
        raise AssertionError("both-sides edit must raise ForkConflict")
    except ForkConflict:
        pass
    res = merge_fork(fork, on_conflict="fork", drop=True)
    assert res["keys_merged"] > 0 and t.latest_version() == res["version"]
    return canonical_scan(t)


SQL_LAKE_FORK_MERGE = f"""
SELECT {_DOC_SQL} AS doc_id,
       CASE WHEN n_chars > 300 THEN 'branch-tag' ELSE source END AS source,
       CAST(n_chars AS BIGINT) AS n_tok
FROM documents
UNION ALL
SELECT 'doc-' || lpad(CAST(doc_id + 4000000 AS VARCHAR), 12, '0') AS doc_id,
       'branch' AS source, CAST(n_chars + 1 AS BIGINT) AS n_tok
FROM documents WHERE doc_id % 11 = 0
"""
