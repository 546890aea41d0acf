"""ANALYZE: per-fragment NDV (distinct-count) column statistics.

The reference keeps no column statistics at all — LanceDB records only
fragment row counts, and fupi never asks for more
(/root/reference/fupi/embedders.py:119-128 just writes and compacts).
At 100-TB scale per-column distinct counts drive planning decisions —
broadcast vs shuffle join dispatch, bucket counts, whether a dedup key
is worth bucketing — and computing them with an exact distinct
exchange costs more than the decisions they optimize. Iceberg solves
this by attaching NDV sketches to snapshots (Puffin stat files); this
op is that shape for our manifests: each fragment gets an HLL register
sidecar per analyzed column (``<fragment>.parquet.ndv``), and because
register-max merge is associative and layout-independent, the
table-level estimate needs only the sidecars (metadata-sized reads),
never a second data pass — and is IDENTICAL however the same rows are
partitioned across fragments.

Same sidecar discipline as token blooms / dedup signature caches:
fragments are immutable and content-addressed, so a sidecar is valid
forever; ``ensure_ndv_sketches`` is incremental (only fragments
missing one pay a read, and that read is column-pruned to the analyzed
columns); a sidecar dies with its fragment (``ops/expire.py`` GC).

Deletion vectors: registers cover PHYSICAL rows; deletes only shrink
the true distinct set, so the estimate is a sound over-approximation —
exactly the zone-map / bloom contract. NDV counts non-null values
(the SQL ``COUNT(DISTINCT col)`` convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from fupi_ray.functions.sketches import hll_estimate, hll_merge, hll_partial
from fupi_ray.manifest import FragmentMeta
from fupi_ray.manifest import fragment_may_match as mf_fragment_may_match
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table

NDV_SUFFIX = ".ndv"
DEFAULT_P = 12  # 4 KiB registers/column/fragment, ~1.6% relative error


def ndv_path(parquet_abs_path: str) -> str:
    return parquet_abs_path + NDV_SUFFIX


def _read_valid_sidecar(
    parquet_abs_path: str, p: int
) -> dict[str, np.ndarray] | None:
    """{column: registers} from a sidecar, or None for absent / torn /
    wrong-precision content — which always means "rebuild me", never an
    error (same contract as the bloom sidecars)."""
    path = ndv_path(parquet_abs_path)
    try:
        if not _fs.exists(path):
            return None
        tbl = _fs.read_parquet_table(path)
        meta = {
            k.decode(): v.decode() for k, v in (tbl.schema.metadata or {}).items()
        }
        if meta.get("p") != str(p):
            return None
        out: dict[str, np.ndarray] = {}
        for col, blob in zip(tbl["column"].to_pylist(), tbl["regs"].to_pylist()):
            regs = np.frombuffer(blob, dtype=np.uint8)
            if len(regs) != 1 << p:
                return None
            out[col] = regs
        return out
    except (OSError, ValueError, KeyError):
        return None


def _write_sidecar(
    parquet_abs_path: str, regs_by_col: dict[str, np.ndarray], p: int
) -> None:
    cols = sorted(regs_by_col)
    tbl = pa.table(
        {
            "column": pa.array(cols),
            "regs": pa.array([regs_by_col[c].tobytes() for c in cols], pa.binary()),
        }
    ).replace_schema_metadata({"p": str(p)})
    try:
        _fs.write_parquet(tbl, ndv_path(parquet_abs_path))
    except OSError:
        pass  # a failed cache write must never fail the analysis


@ray.remote(num_cpus=1)
def _stat_task(
    table_dir: str, rel_paths: list[str], columns: list[str], p: int
) -> list[bool]:
    """Which fragments already hold a sidecar covering all requested
    columns at this precision (parallel stats, like the bloom index)."""
    out = []
    for rel in rel_paths:
        have = _read_valid_sidecar(_fs.join(table_dir, rel), p)
        out.append(have is not None and set(columns) <= set(have))
    return out


@ray.remote(num_cpus=1)
def _build_task(
    table_dir: str, rel_path: str, phys_by_col: dict[str, str | None], p: int
) -> None:
    """Registers for one fragment's requested columns, column-pruned
    read; merged into (not replacing) any columns an existing sidecar
    already covers. A column this fragment physically lacks
    (pre-evolution file) contributes empty registers — correct, since
    scans surface it as all-null there."""
    abs_path = _fs.join(table_dir, rel_path)
    present = sorted({ph for ph in phys_by_col.values() if ph is not None})
    tbl = _fs.read_parquet_table(abs_path, columns=present) if present else None
    regs_by_col = _read_valid_sidecar(abs_path, p) or {}
    for col, phys in phys_by_col.items():
        if phys is None:
            regs_by_col[col] = np.zeros(1 << p, dtype=np.uint8)
        else:
            regs_by_col[col] = hll_partial(tbl[phys].drop_null(), p)
    _write_sidecar(abs_path, regs_by_col, p)


@ray.remote(num_cpus=1)
def _merge_task(
    table_dir: str, rel_paths: list[str], columns: list[str], p: int
) -> tuple[dict[str, np.ndarray], int]:
    """Register-max over one chunk's sidecars; returns the merged
    registers plus the count of fragments whose sidecar was missing a
    requested column (their values are absent from the estimate)."""
    acc = {c: np.zeros(1 << p, dtype=np.uint8) for c in columns}
    missing = 0
    for rel in rel_paths:
        have = _read_valid_sidecar(_fs.join(table_dir, rel), p)
        if have is None or not set(columns) <= set(have):
            missing += 1
            continue
        for c in columns:
            acc[c] = hll_merge(acc[c], have[c])
    return acc, missing


def _phys_names(
    f: FragmentMeta, columns: list[str], manifest_ids: dict | None
) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for c in columns:
        if f.col_ids is not None and manifest_ids:
            out[c] = f.physical_name(c, manifest_ids)
        else:
            out[c] = c if (f.cols is None or c in f.cols) else None
    return out


_CHUNK = 64


def ensure_ndv_sketches(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("doc_id", "source"),
    p: int = DEFAULT_P,
    version: int | None = None,
) -> dict:
    """Build missing NDV sidecars for every fragment of ``version``
    (default latest) covering ``columns``. Incremental: covered
    fragments cost one stat; a sidecar covering only SOME requested
    columns is extended in place (existing columns kept). Returns
    ``{"built", "cached"}``."""
    columns = list(columns)
    m = table.manifest(version)
    for c in columns:
        if c not in m.schema_names:
            raise ValueError(f"analyze: unknown column {c!r}")
        t = m.schema_types[m.schema_names.index(c)]
        if t.startswith("list") or t.startswith("tensor"):
            raise ValueError(
                f"analyze: {c!r} is a nested column; NDV sketches cover "
                "scalar columns (hash the list to a scalar first)"
            )
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    have = ray.get(
        [
            _stat_task.remote(table.table_dir, [f.path for f in ch], columns, p)
            for ch in chunks
        ]
    )
    todo = [f for ch, hs in zip(chunks, have) for f, h in zip(ch, hs) if not h]
    refs = [
        _build_task.remote(
            table.table_dir, f.path, _phys_names(f, columns, m.column_ids), p
        )
        for f in todo
    ]
    if refs:
        ray.get(refs)
    return {"built": len(refs), "cached": len(frags) - len(refs)}


def column_ndv(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("doc_id", "source"),
    p: int = DEFAULT_P,
    version: int | None = None,
    build: bool = True,
    stats_out: dict | None = None,
) -> dict[str, float]:
    """Approximate distinct count per column, answered from the NDV
    sidecars alone — no data pass when they exist. ``build=True``
    (the default) first fills in missing sidecars, paying one
    column-pruned read per NEW fragment — the steady-state cost after
    appends. With ``build=False`` a fragment without a sidecar is
    skipped and counted in ``stats_out["fragments_missing"]``: the
    estimate is then a lower bound."""
    columns = list(columns)
    version = table.latest_version() if version is None else version
    if build:
        ensure_ndv_sketches(table, columns, p, version)
    m = table.manifest(version)
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    parts = ray.get(
        [
            _merge_task.remote(table.table_dir, [f.path for f in ch], columns, p)
            for ch in chunks
        ]
    )
    acc = {c: np.zeros(1 << p, dtype=np.uint8) for c in columns}
    missing = 0
    for regs, miss in parts:
        missing += miss
        for c in columns:
            acc[c] = hll_merge(acc[c], regs[c])
    if stats_out is not None:
        stats_out.update(
            {"fragments_total": len(frags), "fragments_missing": missing, "p": p}
        )
    return {c: float(hll_estimate(acc[c])) for c in columns}


# -- quantile sketches (DDSketch sidecars, same discipline as NDV) ------------
#
# Numeric column distributions drive the OTHER half of planning: range
# predicates (selectivity from quantiles beats min/max alone), skew
# detection before a sort/bucket, and sequence-length budgeting for
# packing. Exact distributed quantiles need a (group,value) exchange
# (queries.q_group_quantiles); the DDSketch sidecar answers table-level
# quantiles from metadata-sized reads at a guaranteed relative error
# (~1% at gamma=1.02), layout-independently. Sidecar file:
# ``<fragment>.parquet.qsk``; one row per analyzed column with the
# sparse bucket arrays as int64 blobs plus exact count/min/max/sum —
# so COUNT/MIN/MAX/SUM/AVG over physical rows come for free.
# Deletion vectors: like NDV, registers cover PHYSICAL rows; estimates
# on a DV-carrying table describe the pre-delete distribution (the
# documented zone-map over-approximation contract).

from fupi_ray.functions.sketches import (  # noqa: E402
    QSK_GAMMA,
    qsk_empty,
    qsk_merge,
    qsk_partial,
    qsk_quantiles,
)

QSK_SUFFIX = ".qsk"


def qsk_path(parquet_abs_path: str) -> str:
    return parquet_abs_path + QSK_SUFFIX


_QSK_FIELDS = ("zero", "count", "vmin", "vmax", "sum")


def _read_valid_qsk(parquet_abs_path: str, gamma: float) -> dict[str, dict] | None:
    """{column: sketch-state} from a sidecar, or None for absent /
    torn / wrong-gamma content (always "rebuild me", never an error)."""
    path = qsk_path(parquet_abs_path)
    try:
        if not _fs.exists(path):
            return None
        tbl = _fs.read_parquet_table(path)
        meta = {
            k.decode(): v.decode() for k, v in (tbl.schema.metadata or {}).items()
        }
        if meta.get("gamma") != repr(gamma):
            return None
        out: dict[str, dict] = {}
        for i in range(tbl.num_rows):
            keys = np.frombuffer(tbl["keys"][i].as_py(), dtype=np.int64)
            counts = np.frombuffer(tbl["counts"][i].as_py(), dtype=np.int64)
            if len(keys) != len(counts):
                return None
            st = {"keys": keys, "counts": counts}
            for f in _QSK_FIELDS:
                st[f] = tbl[f][i].as_py()
            out[tbl["column"][i].as_py()] = st
        return out
    except (OSError, ValueError, KeyError):
        return None


def _write_qsk(
    parquet_abs_path: str, states: dict[str, dict], gamma: float
) -> None:
    cols = sorted(states)
    tbl = pa.table(
        {
            "column": pa.array(cols),
            "keys": pa.array(
                [states[c]["keys"].astype(np.int64).tobytes() for c in cols],
                pa.binary(),
            ),
            "counts": pa.array(
                [states[c]["counts"].astype(np.int64).tobytes() for c in cols],
                pa.binary(),
            ),
            "zero": pa.array([int(states[c]["zero"]) for c in cols], pa.int64()),
            "count": pa.array([int(states[c]["count"]) for c in cols], pa.int64()),
            "vmin": pa.array([float(states[c]["vmin"]) for c in cols], pa.float64()),
            "vmax": pa.array([float(states[c]["vmax"]) for c in cols], pa.float64()),
            "sum": pa.array([float(states[c]["sum"]) for c in cols], pa.float64()),
        }
    ).replace_schema_metadata({"gamma": repr(gamma)})
    try:
        _fs.write_parquet(tbl, qsk_path(parquet_abs_path))
    except OSError:
        pass  # a failed cache write must never fail the analysis


@ray.remote(num_cpus=1)
def _qsk_stat_task(
    table_dir: str, rel_paths: list[str], columns: list[str], gamma: float
) -> list[bool]:
    out = []
    for rel in rel_paths:
        have = _read_valid_qsk(_fs.join(table_dir, rel), gamma)
        out.append(have is not None and set(columns) <= set(have))
    return out


@ray.remote(num_cpus=1)
def _qsk_build_task(
    table_dir: str, rel_path: str, phys_by_col: dict[str, str | None], gamma: float
) -> None:
    """Sketch one fragment's requested columns (column-pruned read);
    merged into any columns an existing sidecar already covers. A
    column this fragment physically lacks (pre-evolution file)
    contributes an empty sketch — scans surface it as all-null there,
    and sketches drop nulls."""
    abs_path = _fs.join(table_dir, rel_path)
    present = sorted({ph for ph in phys_by_col.values() if ph is not None})
    tbl = _fs.read_parquet_table(abs_path, columns=present) if present else None
    states = _read_valid_qsk(abs_path, gamma) or {}
    for col, phys in phys_by_col.items():
        if phys is None:
            states[col] = qsk_empty()
        else:
            states[col] = qsk_partial(tbl[phys].drop_null(), gamma)
    _write_qsk(abs_path, states, gamma)


@ray.remote(num_cpus=1)
def _qsk_merge_task(
    table_dir: str, rel_paths: list[str], columns: list[str], gamma: float
) -> tuple[dict[str, dict], int]:
    acc = {c: qsk_empty() for c in columns}
    missing = 0
    for rel in rel_paths:
        have = _read_valid_qsk(_fs.join(table_dir, rel), gamma)
        if have is None or not set(columns) <= set(have):
            missing += 1
            continue
        for c in columns:
            acc[c] = qsk_merge(acc[c], have[c])
    return acc, missing


_NUMERIC_PREFIXES = ("int", "uint", "float", "double", "bool")


def _check_numeric(m, columns: list[str]) -> None:
    for c in columns:
        if c not in m.schema_names:
            raise ValueError(f"analyze: unknown column {c!r}")
        t = m.schema_types[m.schema_names.index(c)]
        if not t.startswith(_NUMERIC_PREFIXES):
            raise ValueError(
                f"analyze: {c!r} has type {t}; quantile sketches cover "
                "numeric columns"
            )


def ensure_quantile_sketches(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("n_tok",),
    gamma: float = QSK_GAMMA,
    version: int | None = None,
) -> dict:
    """Build missing DDSketch sidecars for every fragment of
    ``version`` covering ``columns`` (numeric only). Incremental and
    in-place-extending, exactly like :func:`ensure_ndv_sketches`."""
    columns = list(columns)
    m = table.manifest(version)
    _check_numeric(m, columns)
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    have = ray.get(
        [
            _qsk_stat_task.remote(table.table_dir, [f.path for f in ch], columns, gamma)
            for ch in chunks
        ]
    )
    todo = [f for ch, hs in zip(chunks, have) for f, h in zip(ch, hs) if not h]
    refs = [
        _qsk_build_task.remote(
            table.table_dir, f.path, _phys_names(f, columns, m.column_ids), gamma
        )
        for f in todo
    ]
    if refs:
        ray.get(refs)
    return {"built": len(refs), "cached": len(frags) - len(refs)}


def column_quantiles(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("n_tok",),
    qs: tuple[float, ...] | list[float] = (0.5, 0.95, 0.99),
    gamma: float = QSK_GAMMA,
    version: int | None = None,
    build: bool = True,
    stats_out: dict | None = None,
) -> dict[str, dict]:
    """Per-column quantile estimates (each within (gamma-1)/(gamma+1)
    relative error, ~1% at the default) plus exact count/min/max/sum/
    mean — answered from the sidecars alone; one column-pruned read
    per NEW fragment when ``build=True``, no data pass otherwise.
    Returns ``{col: {"q0.5": v, ..., "count": n, "min": v, "max": v,
    "sum": v, "mean": v}}``."""
    columns = list(columns)
    version = table.latest_version() if version is None else version
    if build:
        ensure_quantile_sketches(table, columns, gamma, version)
    m = table.manifest(version)
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    parts = ray.get(
        [
            _qsk_merge_task.remote(
                table.table_dir, [f.path for f in ch], columns, gamma
            )
            for ch in chunks
        ]
    )
    acc = {c: qsk_empty() for c in columns}
    missing = 0
    for states, miss in parts:
        missing += miss
        for c in columns:
            acc[c] = qsk_merge(acc[c], states[c])
    if stats_out is not None:
        stats_out.update(
            {
                "fragments_total": len(frags),
                "fragments_missing": missing,
                "gamma": gamma,
            }
        )
    out: dict[str, dict] = {}
    for c in columns:
        st = acc[c]
        vals = qsk_quantiles(st, qs, gamma)
        row = {f"q{q:g}": v for q, v in zip(qs, vals)}
        row.update(
            {
                "count": st["count"],
                "min": st["vmin"] if st["count"] else float("nan"),
                "max": st["vmax"] if st["count"] else float("nan"),
                "sum": st["sum"],
                "mean": st["sum"] / st["count"] if st["count"] else float("nan"),
            }
        )
        out[c] = row
    return out


# -- statistics-driven cardinality estimation ---------------------------------
#
# The point of keeping sketches is to USE them: estimate_rows answers
# "how many rows match this predicate" from metadata alone (quantile
# sidecars where they exist, zone-map pruning as the sound upper
# bound), and delete/update's mode="auto" dispatches DV vs COW on it.
# At 10^12 rows the difference between "rewrite 40% of the table" and
# "write a 2 MB deletion vector" is the whole job cost — a decision
# that must never require reading the data it is deciding about.


def _qsk_count_le(state: dict, x: float, gamma: float, strict: bool = False) -> int:
    """Count of sketched values <= x (< x when strict) — rank
    inversion over the representative values, so the answer is exact
    up to the ~1% bucket-boundary blur."""
    if state["count"] == 0:
        return 0
    k = state["keys"] >> 1
    sign = np.where(state["keys"] & 1 == 1, -1.0, 1.0)
    rep = sign * 2.0 * np.power(gamma, k.astype(np.float64)) / (gamma + 1.0)
    vals = np.concatenate([rep, [0.0]]) if state["zero"] else rep
    cnts = (
        np.concatenate([state["counts"], [state["zero"]]])
        if state["zero"]
        else state["counts"]
    )
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    i = int(np.searchsorted(vals, x, side="left" if strict else "right"))
    return int(cum[i - 1]) if i > 0 else 0


_SKETCHABLE_OPS = {"=", "==", "<", "<=", ">", ">=", "between"}


def estimate_rows(
    table: Table,
    predicate: list[tuple],
    version: int | None = None,
    gamma: float = QSK_GAMMA,
) -> dict:
    """Estimated match count for a predicate conjunction, from
    metadata alone — NO data file is opened (``build=False``
    everywhere; an un-analyzed table degrades to zone maps, never to a
    scan). Returns ``{"estimated", "upper_bound", "total", "method",
    "fragments_may_match"}``:

    - ``upper_bound`` — rows in fragments the zone maps cannot rule
      out: sound (never below the true count over PHYSICAL rows).
    - ``estimated`` — per-conjunct selectivities from the DDSketch
      sidecars where present (numeric column, range-shaped op),
      combined under the independence heuristic, clamped to the upper
      bound; conjuncts without a sketch fall back to their zone-map
      fraction. ``method`` says which tier answered.

    Sketches count physical rows (the documented DV over-approximation
    contract), so estimates on a DV-carrying table lean high — the
    safe direction for a rewrite-vs-DV dispatch."""
    m = table.manifest(version)
    live = [f for f in m.fragments if f.live_rows]
    total = sum(f.live_rows for f in live)
    may = [f for f in live if mf_fragment_may_match(f, predicate)]
    upper = sum(f.live_rows for f in may)
    if not predicate or total == 0:
        return {
            "estimated": total,
            "upper_bound": total,
            "total": total,
            "method": "trivial",
            "fragments_may_match": len(may),
        }

    numeric = set()
    for c, t in zip(m.schema_names, m.schema_types):
        if t.startswith(_NUMERIC_PREFIXES):
            numeric.add(c)
    want = sorted(
        {
            col
            for col, op, _ in predicate
            if col in numeric and op in _SKETCHABLE_OPS
        }
    )
    states: dict[str, dict] = {}
    if want:
        chunks = [live[i : i + _CHUNK] for i in range(0, len(live), _CHUNK)]
        parts = ray.get(
            [
                _qsk_merge_task.remote(
                    table.table_dir, [f.path for f in ch], want, gamma
                )
                for ch in chunks
            ]
        )
        missing = sum(p[1] for p in parts)
        if missing == 0:  # every fragment sketched: the estimates hold
            for sts, _ in parts:
                for c in want:
                    states[c] = (
                        qsk_merge(states[c], sts[c]) if c in states else sts[c]
                    )

    frac = 1.0
    used_sketch = False
    for col, op, val in predicate:
        st = states.get(col)
        if st is not None and st["count"] > 0 and op in _SKETCHABLE_OPS:
            n = st["count"]
            if op in ("=", "=="):
                # mass of the bucket(s) containing val: probe the
                # [val/gamma, val*gamma] window, since the stored
                # representative differs from val by up to the bucket
                # width (an exact-rep probe would count zero for any
                # value that isn't itself a representative)
                lo_v, hi_v = sorted((val * gamma, val / gamma))
                hit = _qsk_count_le(st, hi_v, gamma) - _qsk_count_le(
                    st, lo_v, gamma, strict=True
                )
            elif op == "<":
                hit = _qsk_count_le(st, val, gamma, strict=True)
            elif op == "<=":
                hit = _qsk_count_le(st, val, gamma)
            elif op == ">":
                hit = n - _qsk_count_le(st, val, gamma)
            elif op == ">=":
                hit = n - _qsk_count_le(st, val, gamma, strict=True)
            else:  # between
                lo, hi = val
                hit = _qsk_count_le(st, hi, gamma) - _qsk_count_le(
                    st, lo, gamma, strict=True
                )
            frac *= hit / n
            used_sketch = True
        else:
            # zone-map fallback for THIS conjunct: fraction of rows in
            # fragments it cannot rule out (an upper bound, used as
            # the estimate)
            c_upper = sum(
                f.live_rows
                for f in live
                if mf_fragment_may_match(f, [(col, op, val)])
            )
            frac *= c_upper / total
    est = min(int(round(total * frac)), upper)
    return {
        "estimated": est,
        "upper_bound": upper,
        "total": total,
        "method": "ddsketch" if used_sketch else "zonemap",
        "fragments_may_match": len(may),
    }


def explain_predicate(
    table: Table,
    predicate: list[tuple],
    version: int | None = None,
    probe_blooms: bool = True,
) -> dict:
    """EXPLAIN for a predicate, from metadata + sidecars only: how much
    of the table each pruning tier eliminates before any data read,
    what the cardinality estimate says, and which mutation mode
    ``mode="auto"`` would pick. Tiers, in the order a scan/mutation
    applies them:

    1. zone maps + bucket tags — fragments the min/max ranges (and the
       hash-bucket tag, for ``==``/``in`` on the layout key) rule out;
    2. doc_id bloom sidecars — point conjuncts proven absent per
       fragment (one sidecar read each, no Parquet opened); skipped
       unless ``probe_blooms`` and a doc_id ==/in conjunct exists;
    3. DDSketch/zone cardinality estimate (:func:`estimate_rows`).

    Row-group pruning INSIDE surviving fragments happens at scan time
    via Parquet footer stats (``Table.row_group_prune_stats`` audits
    it) and is not measured here — this call stays metadata-cost."""
    from fupi_ray import manifest as _mf

    m = table.manifest(version)
    live = [f for f in m.fragments if f.live_rows]
    survivors = []
    for f in live:
        alive = [p for p in predicate if f.has_column(p[0], m.column_ids)]
        if mf_fragment_may_match(f, alive) and _mf.fragment_bucket_may_match(
            f, alive
        ):
            survivors.append(f)
    out = {
        "total_rows": sum(f.live_rows for f in live),
        "total_fragments": len(live),
        "zonemap_fragments": len(survivors),
        "zonemap_rows_upper": sum(f.live_rows for f in survivors),
    }

    has_point = any(
        col == "doc_id" and op in ("=", "==", "in") for col, op, _ in predicate
    )
    if probe_blooms and has_point and survivors:
        from fupi_ray.ops.mutate import _bloom_proves_no_match

        doc_t = dict(zip(m.schema_names, m.schema_types)).get("doc_id", "")
        kind = (
            "int"
            if doc_t.startswith(("int", "uint"))
            else ("string" if "string" in doc_t else None)
        )
        after = [
            f
            for f in survivors
            if not _bloom_proves_no_match(
                _fs.join(table.table_dir, f.path), predicate, kind
            )
        ]
        out["bloom_fragments"] = len(after)
        out["bloom_rows_upper"] = sum(f.live_rows for f in after)

    est = estimate_rows(table, predicate, version=version)
    out["estimated_rows"] = est["estimated"]
    out["estimate_method"] = est["method"]
    if est["total"]:
        frac = est["estimated"] / est["total"]
        out["auto_mutation_mode"] = (
            "dv" if frac <= table.config.mutation_auto_dv_fraction else "cow"
        )
    else:
        out["auto_mutation_mode"] = "dv"
    return out


# -- heavy-hitter sketches (Misra-Gries sidecars) ------------------------------
#
# The third planning statistic: key SKEW. NDV says how many distinct
# values a join/bucket key has; quantiles describe numeric spread;
# neither sees the one value that is 30% of the table — the thing that
# actually sinks a shuffle (one reducer gets 30% of 100 TB). A
# Misra-Gries summary per fragment (``<fragment>.parquet.hh``) keeps
# ≤k counters with an explicit error bound carried in the state, so a
# table-level "is this key skewed, and by how much" is a sidecar read:
# the operator checks it before choosing a bucket count or deciding to
# salt, never by scanning the data.

from fupi_ray.functions.sketches import (  # noqa: E402
    mg_heavy_hitters,
    mg_merge,
    mg_partial,
)

HH_SUFFIX = ".hh"
DEFAULT_MG_K = 256


def hh_path(parquet_abs_path: str) -> str:
    return parquet_abs_path + HH_SUFFIX


def _read_valid_hh(parquet_abs_path: str, k: int) -> dict[str, dict] | None:
    path = hh_path(parquet_abs_path)
    try:
        if not _fs.exists(path):
            return None
        tbl = _fs.read_parquet_table(path)
        meta = {
            kk.decode(): v.decode() for kk, v in (tbl.schema.metadata or {}).items()
        }
        if meta.get("k") != str(k):
            return None
        out: dict[str, dict] = {}
        for i in range(tbl.num_rows):
            keys = tbl["keys"][i].as_py()
            counts = np.frombuffer(tbl["counts"][i].as_py(), dtype=np.int64)
            if len(keys) != len(counts):
                return None
            out[tbl["column"][i].as_py()] = {
                "keys": keys,
                "counts": counts,
                "residual": tbl["residual"][i].as_py(),
                "n": tbl["n"][i].as_py(),
            }
        return out
    except (OSError, ValueError, KeyError):
        return None


def _write_hh(parquet_abs_path: str, states: dict[str, dict], k: int) -> None:
    cols = sorted(states)
    tbl = pa.table(
        {
            "column": pa.array(cols),
            "keys": pa.array(
                [list(states[c]["keys"]) for c in cols], pa.list_(pa.string())
            ),
            "counts": pa.array(
                [np.asarray(states[c]["counts"], np.int64).tobytes() for c in cols],
                pa.binary(),
            ),
            "residual": pa.array([int(states[c]["residual"]) for c in cols], pa.int64()),
            "n": pa.array([int(states[c]["n"]) for c in cols], pa.int64()),
        }
    ).replace_schema_metadata({"k": str(k)})
    try:
        _fs.write_parquet(tbl, hh_path(parquet_abs_path))
    except OSError:
        pass  # a failed cache write must never fail the analysis


@ray.remote(num_cpus=1)
def _hh_stat_task(
    table_dir: str, rel_paths: list[str], columns: list[str], k: int
) -> list[bool]:
    out = []
    for rel in rel_paths:
        have = _read_valid_hh(_fs.join(table_dir, rel), k)
        out.append(have is not None and set(columns) <= set(have))
    return out


@ray.remote(num_cpus=1)
def _hh_build_task(
    table_dir: str, rel_path: str, phys_by_col: dict[str, str | None], k: int
) -> None:
    abs_path = _fs.join(table_dir, rel_path)
    present = sorted({ph for ph in phys_by_col.values() if ph is not None})
    tbl = _fs.read_parquet_table(abs_path, columns=present) if present else None
    states = _read_valid_hh(abs_path, k) or {}
    for col, phys in phys_by_col.items():
        if phys is None:
            states[col] = mg_partial(np.array([], dtype=object), k)
        else:
            states[col] = mg_partial(tbl[phys].drop_null(), k)
    _write_hh(abs_path, states, k)


@ray.remote(num_cpus=1)
def _hh_merge_task(
    table_dir: str, rel_paths: list[str], columns: list[str], k: int
) -> tuple[dict[str, dict], int]:
    acc = {c: mg_partial(np.array([], dtype=object), k) for c in columns}
    missing = 0
    for rel in rel_paths:
        have = _read_valid_hh(_fs.join(table_dir, rel), k)
        if have is None or not set(columns) <= set(have):
            missing += 1
            continue
        for c in columns:
            acc[c] = mg_merge(acc[c], have[c], k)
    return acc, missing


def ensure_hh_sketches(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("source",),
    k: int = DEFAULT_MG_K,
    version: int | None = None,
) -> dict:
    """Build missing Misra-Gries sidecars (scalar columns; same
    incremental/extension contract as the NDV and quantile passes)."""
    columns = list(columns)
    m = table.manifest(version)
    for c in columns:
        if c not in m.schema_names:
            raise ValueError(f"analyze: unknown column {c!r}")
        t = m.schema_types[m.schema_names.index(c)]
        if t.startswith("list") or t.startswith("tensor"):
            raise ValueError(
                f"analyze: {c!r} is a nested column; heavy-hitter "
                "sketches cover scalar columns"
            )
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    have = ray.get(
        [
            _hh_stat_task.remote(table.table_dir, [f.path for f in ch], columns, k)
            for ch in chunks
        ]
    )
    todo = [f for ch, hs in zip(chunks, have) for f, h in zip(ch, hs) if not h]
    refs = [
        _hh_build_task.remote(
            table.table_dir, f.path, _phys_names(f, columns, m.column_ids), k
        )
        for f in todo
    ]
    if refs:
        ray.get(refs)
    return {"built": len(refs), "cached": len(frags) - len(refs)}


def column_heavy_hitters(
    table: Table,
    columns: tuple[str, ...] | list[str] = ("source",),
    min_fraction: float = 0.01,
    k: int = DEFAULT_MG_K,
    version: int | None = None,
    build: bool = True,
    stats_out: dict | None = None,
) -> dict[str, list[dict]]:
    """Per-column frequent values with guaranteed count bounds,
    answered from the sidecars alone: each entry carries ``lower``
    (true count is at least this) and ``upper`` (at most this), and
    any value whose true count exceeds the carried residual is
    guaranteed present — the mergeable-summary contract, so the skew
    verdict is layout-independent and never requires a data pass."""
    columns = list(columns)
    version = table.latest_version() if version is None else version
    if build:
        ensure_hh_sketches(table, columns, k, version)
    m = table.manifest(version)
    frags = [f for f in m.fragments if f.rows]
    chunks = [frags[i : i + _CHUNK] for i in range(0, len(frags), _CHUNK)]
    parts = ray.get(
        [
            _hh_merge_task.remote(table.table_dir, [f.path for f in ch], columns, k)
            for ch in chunks
        ]
    )
    acc = {c: mg_partial(np.array([], dtype=object), k) for c in columns}
    missing = 0
    for states, miss in parts:
        missing += miss
        for c in columns:
            acc[c] = mg_merge(acc[c], states[c], k)
    if stats_out is not None:
        stats_out.update(
            {
                "fragments_total": len(frags),
                "fragments_missing": missing,
                "k": k,
                "residual": {c: acc[c]["residual"] for c in columns},
            }
        )
    return {c: mg_heavy_hitters(acc[c], min_fraction) for c in columns}
