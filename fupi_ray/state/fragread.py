"""Shared per-fragment read recipe for ops that bypass ``Table.scan``
with their own task-per-fragment plans (bucketed joins, order-proved
sorted scans): deletion-vector mask → rename reconciliation →
schema-evolution normalization, from a JSON-serializable spec.

One copy of the recipe: a fix to DV/rename/evolution handling lands
here once instead of diverging across readers.
"""

from __future__ import annotations

import pyarrow as pa

from fupi_ray import manifest as mf


def fragment_spec(f, manifest_ids: dict, cols: list[str] | None) -> dict:
    """JSON-serializable read plan for one fragment: its path, DV
    sidecar, rename map (file name → declared name) and the PHYSICAL
    columns to read (declared ``cols`` translated through the inverse
    rename map, pruned to columns the file actually has — a missing
    evolution column is padded later, not read)."""
    rmap = f.rename_map(manifest_ids) if manifest_ids else {}
    inv = {d: p for p, d in rmap.items()}
    phys = [inv.get(c, c) for c in cols] if cols is not None else None
    if phys is not None and f.cols is not None:
        have = set(f.cols)
        phys = [c for c in phys if c in have]
    return {"path": f.path, "dv": f.dv_path or "", "rmap": rmap, "cols": phys}


def read_fragment_normalized(
    table_dir: str,
    spec: dict,
    names: list[str],
    type_strs: list[str],
    fill: dict | None,
) -> pa.Table:
    """Execute one spec inside a worker task: masked read (whole-file
    positions, column pruning composes), declared names restored,
    normalized (pad/cast/order) to the declared column subset."""
    from fupi_ray.ops.dv import masked_fragment_table
    from fupi_ray.schema import normalize_batch

    schema = pa.schema(
        [(nm, mf.type_from_str(t)) for nm, t in zip(names, type_strs)]
    )
    t = masked_fragment_table(
        table_dir, spec["path"], spec["dv"] or None, columns=spec["cols"] or None
    )
    t = mf.apply_rename(t, spec["rmap"])
    return normalize_batch(t, schema, fill or {}, drop_extra=True)
