"""Sources: lazy Dataset constructors for every input format the
reference consumes (SURVEY.md §2.1).

The reference reads a JSONL.gz dump through DuckDB ``read_json_auto``
and materializes it wholesale on the driver (fupi/data.py:41-74 — S1 +
the S2 anti-pattern). Here every source returns a lazy
``ray.data.Dataset``; nothing materializes (S2 is deliberately NOT
reproduced — at 100 TB the driver-side ``to_pylist`` is the first
thing to die).
"""

from __future__ import annotations

import os
from typing import Sequence

import ray.data

# concurrent read PLANNING is safe here: state/fs.py installs a
# process-wide stand-in for fsspec's aiohttp-dependent http module at
# import (see fs._shim_fsspec_http), which is what Ray's path
# resolution would otherwise re-import — racily — on every plan.
from fupi_ray.state import fs as _fs  # noqa: F401  (shim side effect)


def read_jsonl(paths: str | Sequence[str], **kwargs) -> ray.data.Dataset:
    """S1: JSONL(.gz) reader with schema inference; Arrow JSON reader
    auto-decompresses ``.gz`` (reference: read_json_auto,
    fupi/data.py:64)."""
    return ray.data.read_json(paths, **kwargs)


def read_parquet_table(
    paths: str | Sequence[str],
    columns: Sequence[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Parquet source with column pruning at the read (never load all
    columns for a narrow transform)."""
    if columns is not None:
        kwargs["columns"] = list(columns)
    return ray.data.read_parquet(paths, **kwargs)


def read_csv(paths: str | Sequence[str], **kwargs) -> ray.data.Dataset:
    return ray.data.read_csv(paths, **kwargs)


def read_text(paths: str | Sequence[str], **kwargs) -> ray.data.Dataset:
    """One row per line — raw-corpus ingestion."""
    return ray.data.read_text(paths, **kwargs)


def read_binary(paths: str | Sequence[str], include_paths: bool = True, **kwargs) -> ray.data.Dataset:
    """Opaque binary payloads (multimodal ingest: images/audio as
    bytes + path metadata)."""
    return ray.data.read_binary_files(paths, include_paths=include_paths, **kwargs)


def from_arrow(table) -> ray.data.Dataset:
    return ray.data.from_arrow(table)


def testdata_table(sf_dir: str, name: str, columns: Sequence[str] | None = None) -> ray.data.Dataset:
    """Convenience accessor for the driver-generated testdata tables."""
    return read_parquet_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
