"""Per-partition lineage checkpoints → resumable maintenance jobs.

The reference has no checkpointing (a crash reruns the whole job,
SURVEY.md §4 "Checkpoint / resume"); the north rule requires jobs
resumable from per-partition lineage recording input fragments, output
fragments and row counts. A partition here is the unit of independent
work: a compaction pack, a MERGE bucket, a cluster range.

Protocol (idempotent, rename-committed):
  1. worker writes output fragment(s) to their final data/ paths
     (uuid/job-scoped names → retried tasks can't clobber good output),
  2. worker atomically writes ``lineage/<job_id>/<partition>.json``,
  3. the job commits the manifest only from lineage records.
A resumed job skips every partition whose lineage record exists —
its outputs are already durable — and recomputes the rest.
"""

from __future__ import annotations

import json
import os
from typing import Any

from fupi_ray import manifest as mf
from fupi_ray.manifest import FragmentMeta, _atomic_write
from fupi_ray.state import fs as _fs


def _job_dir(table_dir: str, job_id: str) -> str:
    return _fs.join(mf.lineage_dir(table_dir), job_id)


def record_path(table_dir: str, job_id: str, partition: str) -> str:
    return _fs.join(_job_dir(table_dir, job_id), f"{partition}.json")


def write_record(
    table_dir: str,
    job_id: str,
    partition: str,
    input_fragments: list[str],
    output_fragments: list[FragmentMeta],
    metrics: dict[str, Any] | None = None,
) -> None:
    rec = {
        "job_id": job_id,
        "partition": partition,
        "input_fragments": input_fragments,
        "output_fragments": [f.to_dict() for f in output_fragments],
        "row_count": sum(f.rows for f in output_fragments),
        "metrics": metrics or {},
    }
    _atomic_write(record_path(table_dir, job_id, partition), json.dumps(rec, indent=1, default=str))


def read_record(table_dir: str, job_id: str, partition: str) -> dict | None:
    p = record_path(table_dir, job_id, partition)
    if _fs.is_uri(p):
        if not _fs.exists(p):
            return None
        return json.loads(_fs.read_text(p))
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def list_jobs(table_dir: str) -> list[str]:
    """Job ids with at least one lineage record."""
    d = mf.lineage_dir(table_dir)
    if _fs.is_uri(d):
        return [n for n in _fs.ls_names(d) if _fs.isdir(_fs.join(d, n))]
    if not os.path.isdir(d):
        return []
    return [n for n in os.listdir(d) if os.path.isdir(os.path.join(d, n))]


def completed_partitions(table_dir: str, job_id: str) -> dict[str, dict]:
    d = _job_dir(table_dir, job_id)
    out: dict[str, dict] = {}
    if _fs.is_uri(d):
        for name in _fs.ls_names(d):
            if name.endswith(".json"):
                rec = json.loads(_fs.read_text(_fs.join(d, name)))
                out[rec["partition"]] = rec
        return out
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                out[rec["partition"]] = rec
    return out


def output_fragments(rec: dict) -> list[FragmentMeta]:
    return [FragmentMeta.from_dict(d) for d in rec["output_fragments"]]


def clear_job(table_dir: str, job_id: str) -> None:
    d = _job_dir(table_dir, job_id)
    if _fs.is_uri(d):
        _fs.rm_dir(d)
        return
    if os.path.isdir(d):
        for name in os.listdir(d):
            os.unlink(os.path.join(d, name))
        os.rmdir(d)
