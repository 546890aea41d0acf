"""check_table: lakehouse consistency checker ("fsck").

The reference trusts LanceDB's internal invariants and has no audit
surface at all; an engine that OWNS its manifests, deletion vectors,
bloom sidecars and bucket tags needs one — operators run it after an
incident (partial restore, manual file surgery, suspected bug) and as
a scheduled canary. Two tiers:

* **metadata tier (default)** — no data reads. Verifies that the
  version chain is readable, every live fragment / DV / staged file
  exists on storage, DV positions stay inside their fragment, zone
  maps are well-formed (min ≤ max), ``live_rows`` arithmetic holds,
  and a declared bucket layout is unanimous across live fragments.
  Cost: O(manifest + one stat per file) — safe on a 100 TB table.
* **deep tier (``deep=True``)** — adds one Parquet FOOTER read per
  live fragment (still no row data): the footer row count must equal
  the manifest's, and the footer's per-column min/max statistics must
  fall INSIDE the manifest zone map (the zone map may be wider —
  conservative — but never narrower, or pruning would skip live rows).
  Footer reads fan out as capped Ray tasks, the same copy-concurrency
  governor every rewrite path uses.

Findings are returned, not raised: ``{"ok": bool, "findings":
[{code, path, detail}, ...], ...}``. Every code is also a test case
(`tests/test_fsck.py` corrupts a table on purpose and expects the
exact finding).
"""

from __future__ import annotations

import numpy as np
import ray

from fupi_ray import manifest as mf
from fupi_ray.ops import _fanout
from fupi_ray.ops.bucket import fragment_layout, read_layout
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table


@ray.remote(num_cpus=1)
def _dv_check_task(
    table_dir: str, frag_path: str, dv_rel: str, rows: int, dv_rows: int
) -> list[dict]:
    """One deletion-vector sidecar's audit: readable, count matches the
    manifest, positions in range and strictly increasing. Corruption is
    a finding, never a raise."""
    from fupi_ray.ops.dv import read_dv

    out: list[dict] = []
    try:
        pos = read_dv(table_dir, dv_rel)
    except Exception as e:
        return [{"code": "dv-unreadable", "path": dv_rel, "detail": str(e)}]
    if len(pos) != dv_rows:
        out.append(
            {
                "code": "dv-count-mismatch",
                "path": dv_rel,
                "detail": f"manifest dv_rows={dv_rows} sidecar={len(pos)}",
            }
        )
    if len(pos) and (int(pos[-1]) >= rows or int(pos[0]) < 0):
        out.append(
            {
                "code": "dv-position-out-of-range",
                "path": dv_rel,
                "detail": f"positions [{pos[0]},{pos[-1]}] vs rows={rows}",
            }
        )
    if len(pos) > 1 and bool(np.any(np.diff(pos) <= 0)):
        out.append(
            {
                "code": "dv-not-sorted-unique",
                "path": dv_rel,
                "detail": "positions must be strictly increasing",
            }
        )
    return out


@ray.remote(num_cpus=1)
def _footer_check_task(table_dir: str, frag: dict) -> list[dict]:
    """One fragment's deep check: footer row count vs manifest, footer
    column stats inside the manifest zone map. Footer-only — no row
    data is decoded."""
    out: list[dict] = []
    path = frag["path"]
    try:
        pf = _fs.parquet_file(_fs.join(table_dir, path))
    except Exception as e:  # unreadable footer is its own finding
        return [{"code": "footer-unreadable", "path": path, "detail": str(e)}]
    meta = pf.metadata
    if meta.num_rows != frag["rows"]:
        out.append(
            {
                "code": "rows-mismatch",
                "path": path,
                "detail": f"manifest rows={frag['rows']} footer rows={meta.num_rows}",
            }
        )
    # footer stats must sit INSIDE the manifest zone map
    name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    for col, zm in (frag.get("zone_map") or {}).items():
        ci = name_to_idx.get(col)
        if ci is None or zm is None:
            continue
        lo = hi = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            continue  # no stats → nothing to verify against
        try:
            too_narrow = lo < zm["min"] or hi > zm["max"]
        except (KeyError, TypeError):
            # malformed entries are the metadata tier's finding
            # (zone-map-malformed); incomparable types (e.g. truncated
            # binary stats) are unverifiable — either way, never raise
            # out of the audit task
            continue
        if too_narrow:
            out.append(
                {
                    "code": "zone-map-narrower-than-data",
                    "path": path,
                    "detail": f"{col}: footer [{lo!r},{hi!r}] outside "
                    f"manifest [{zm['min']!r},{zm['max']!r}]",
                }
            )
    return out


def check_table(
    table: Table, version: int | None = None, deep: bool = False
) -> dict:
    """Audit ``table`` at ``version`` (default latest). Returns
    ``{"ok", "findings", "fragments_checked", "versions_checked",
    "deep"}`` — see module docstring for the two tiers."""
    findings: list[dict] = []

    def add(code: str, path: str, detail: str):
        findings.append({"code": code, "path": path, "detail": detail})

    # -- version chain: every surviving manifest header must load ------
    versions = table.versions()
    if not versions:
        add("no-versions", table.table_dir, "table has no committed versions")
    for v in versions:
        try:
            mf.read_manifest_header(table.table_dir, v)
        except FileNotFoundError:
            continue  # expired concurrently — not a corruption
        except Exception as e:
            add("manifest-unreadable", f"manifest v{v}", str(e))

    # the audited manifest itself may be the corrupt artifact — a crash
    # here would discard the findings already collected, violating the
    # "findings are returned, not raised" contract on exactly the input
    # fsck exists for
    try:
        m = table.manifest(version)
    except Exception as e:
        add(
            "audited-manifest-unreadable",
            f"manifest v{version if version is not None else 'latest'}",
            str(e),
        )
        return {
            "ok": False,
            "findings": findings,
            "fragments_checked": 0,
            "versions_checked": len(versions),
            "deep": deep,
        }
    seen_paths: set[str] = set()
    present: set[str] = set()  # stat'ed once here; the deep tier reuses it
    dv_work: list[tuple] = []  # validated by capped fan-out, not the driver
    for f in m.fragments:
        if f.path in seen_paths:
            add("duplicate-fragment", f.path, "listed twice in one manifest")
        seen_paths.add(f.path)
        abs_path = _fs.join(table.table_dir, f.path)
        if not _fs.exists(abs_path):
            add("missing-fragment", f.path, "file not found on storage")
            continue
        present.add(f.path)
        if f.rows < 0 or f.dv_rows < 0 or f.live_rows < 0:
            add(
                "row-accounting",
                f.path,
                f"rows={f.rows} dv_rows={f.dv_rows} live_rows={f.live_rows}",
            )
        for col, zm in (f.zone_map or {}).items():
            if zm is None:
                continue
            try:
                bad = zm["min"] > zm["max"]
            except (KeyError, TypeError):
                add("zone-map-malformed", f.path, f"{col}: {zm!r}")
                continue
            if bad:
                add("zone-map-inverted", f.path, f"{col}: {zm!r}")
        if f.dv_path:
            dv_abs = _fs.join(table.table_dir, f.dv_path)
            if not _fs.exists(dv_abs):
                add("missing-dv", f.dv_path, f"for fragment {f.path}")
            else:
                dv_work.append((f.path, f.dv_path, f.rows, f.dv_rows))

    # -- DV sidecar contents, validated inside capped tasks: a 100 TB
    # table can carry thousands of DVs and the driver must not read
    # them serially; corrupt sidecars are findings, never raises ------
    if dv_work:
        for r in _fanout.run_capped(
            _dv_check_task,
            [(table.table_dir,) + w for w in dv_work],
            _fanout.copy_concurrency_cap(table.config.memcpy_max_concurrency),
        ):
            findings.extend(r)

    # -- staged (WAP) fragments must exist until published/aborted -----
    from fupi_ray.ops.stage import list_stages

    for rec in list_stages(table):
        for fd in rec.get("fragments", []):
            p = fd.get("path")
            if p and not _fs.exists(_fs.join(table.table_dir, p)):
                add("missing-staged-fragment", p, f"stage {rec.get('stage_id')}")

    # -- bucket layout contract (shuffle-free joins depend on it) ------
    lay = read_layout(table)
    # a declared layout over ZERO live fragments is vacuously intact (a
    # COW delete can empty a bucketed table without breaking anything)
    if lay is not None and m.fragments:
        live_lay = fragment_layout(m)
        if live_lay is None:
            untagged = [f.path for f in m.fragments if f.bucket is None]
            add(
                "bucket-contract-broken",
                lay["key"],
                f"declared {lay['num_buckets']}-bucket layout; "
                f"{len(untagged)} live fragment(s) untagged or mixed "
                f"(maintain() repairs this)",
            )
        elif live_lay["num_buckets"] != lay["num_buckets"] or live_lay["key"] != lay["key"]:
            add(
                "bucket-contract-mismatch",
                lay["key"],
                f"declared {lay} but live fragments carry {live_lay}",
            )

    fragments_checked = len(m.fragments)
    if deep:
        live = [
            {"path": f.path, "rows": f.rows, "zone_map": f.zone_map}
            for f in m.fragments
            if f.path in present  # already stat'ed by the metadata tier
        ]
        results = _fanout.run_capped(
            _footer_check_task,
            [(table.table_dir, fr) for fr in live],
            _fanout.copy_concurrency_cap(table.config.memcpy_max_concurrency),
        )
        for r in results:
            findings.extend(r)

    return {
        "ok": not findings,
        "findings": findings,
        "fragments_checked": fragments_checked,
        "versions_checked": len(versions),
        "deep": deep,
    }
