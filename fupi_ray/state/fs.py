"""URI-aware path + filesystem helpers (SURVEY.md §2.1 S8).

The reference reads its table from object storage through Lance's
filesystem layer (fupi/utils.py:15-33 opens a LanceDB uri that may be
s3); the engine's equivalent protocol surface is fsspec. Plain local
paths take the untouched ``os`` fast path (atomic rename + link(2)
commit guards); any ``scheme://`` path routes through fsspec, and
scans wrap the fsspec instance in a pyarrow ``PyFileSystem`` so Ray
Data *worker processes* read fragments through the same protocol
(``file://``, ``s3://``, ``gs://``, ``memory://``, ...).

Two deliberate protocol differences from the local path, both
documented at the call sites:

- manifest writes are single ``pipe_file`` puts (atomic on object
  stores) instead of tmp-file + ``rename``;
- the duplicate-version commit guard is exists-then-put instead of
  ``link(2)`` — object stores have no hard links; the commit actor
  already serializes writers within a cluster, so the guard only
  weakens for two *independent clusters* racing on one table.
"""

from __future__ import annotations

import os


def is_uri(path: str) -> bool:
    return "://" in str(path)


def is_process_local(path: str) -> bool:
    """memory:// lives inside the calling process only — Ray actors and
    workers cannot see its files, so commit serialization (and any
    worker-side I/O) must stay in-process for it. Every shared
    protocol (file, s3, gs, ...) returns False."""
    return str(path).startswith("memory://")


def join(base: str, *parts: str) -> str:
    """Path join that never corrupts a URI (``os.path.join`` would
    backslash it on Windows and can swallow the scheme). A part that is
    itself a URI or an absolute path stands alone — zero-copy table
    forks reference the source table's fragments by absolute path, and
    every read site resolves them through this join."""
    out = str(base)
    for p in parts:
        p = str(p)
        if is_uri(p) or os.path.isabs(p):
            out = p
        elif is_uri(out):
            out = out.rstrip("/") + "/" + p.strip("/")
        else:
            out = os.path.join(out, p)
    return out


def dirname(path: str) -> str:
    if is_uri(path):
        return str(path).rstrip("/").rsplit("/", 1)[0]
    return os.path.dirname(path)


def get_fs(path: str):
    """``(fsspec filesystem, protocol-stripped path)``."""
    import fsspec

    return fsspec.core.url_to_fs(path)


def arrow_fs(path: str):
    """``(pyarrow FileSystem, stripped path)`` — the wrapper pickles
    into Ray Data read tasks so workers resolve the same protocol."""
    from pyarrow import fs as pafs

    f, stripped = get_fs(path)
    return pafs.PyFileSystem(pafs.FSSpecHandler(f)), stripped


def exists(path: str) -> bool:
    if is_uri(path):
        f, p = get_fs(path)
        return f.exists(p)
    return os.path.exists(path)


def makedirs(path: str) -> None:
    if is_uri(path):
        f, p = get_fs(path)
        f.makedirs(p, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def write_text(path: str, content: str) -> None:
    """Whole-file put. On object stores a put IS atomic; local callers
    that need rename-atomicity use manifest._atomic_write instead."""
    f, p = get_fs(path)
    parent = p.rsplit("/", 1)[0] if "/" in p else ""
    if parent:
        f.makedirs(parent, exist_ok=True)
    f.pipe_file(p, content.encode("utf-8"))


def read_text(path: str) -> str:
    f, p = get_fs(path)
    return f.cat_file(p).decode("utf-8")


def write_bytes(path: str, content: bytes) -> None:
    """Whole-file binary put (bloom sidecars); local fast path avoids
    the fsspec layer on the hot fragment-write path."""
    if is_uri(path):
        f, p = get_fs(path)
        parent = p.rsplit("/", 1)[0] if "/" in p else ""
        if parent:
            f.makedirs(parent, exist_ok=True)
        f.pipe_file(p, content)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(content)


def read_bytes(path: str) -> bytes:
    if is_uri(path):
        f, p = get_fs(path)
        return f.cat_file(p)
    with open(path, "rb") as fh:
        return fh.read()


def ls_names(dir_path: str) -> list[str]:
    """Basenames in a directory; [] when absent."""
    f, p = get_fs(dir_path)
    if not f.exists(p):
        return []
    return [str(e).rstrip("/").rsplit("/", 1)[-1] for e in f.ls(p, detail=False)]


def rm(path: str) -> None:
    f, p = get_fs(path)
    if f.exists(p):
        f.rm_file(p)


def size(path: str) -> int:
    if is_uri(path):
        f, p = get_fs(path)
        return f.size(p)
    return os.path.getsize(path)


def open_write(path: str):
    """Binary write handle through the path's protocol."""
    import fsspec

    makedirs(dirname(path))
    return fsspec.open(path, "wb").open()


# ---------------------------------------------------------------------------
# Parquet + directory primitives for the maintenance ops (compact /
# merge / cluster / expire must run against scheme:// tables — on a
# real deployment the lakehouse lives on object storage). Local paths
# keep the plain-os fast path.
# ---------------------------------------------------------------------------


def parquet_file(path: str):
    """``pyarrow.parquet.ParquetFile`` for any protocol."""
    import pyarrow.parquet as pq

    if is_uri(path):
        from pyarrow import fs as pafs

        f, p = get_fs(path)
        return pq.ParquetFile(
            pafs.PyFileSystem(pafs.FSSpecHandler(f)).open_input_file(p)
        )
    return pq.ParquetFile(path)


def read_parquet_table(path: str, **kwargs):
    import pyarrow.parquet as pq

    if is_uri(path):
        filesystem, p = arrow_fs(path)
        return pq.read_table(p, filesystem=filesystem, **kwargs)
    return pq.read_table(path, **kwargs)


def write_parquet(tbl, path: str, row_group_size: int | None = None) -> None:
    """Atomic-enough parquet write: local = tmp file + rename; URI =
    one whole-object put through the protocol (atomic on object
    stores by definition)."""
    import pyarrow.parquet as pq

    if is_uri(path):
        with open_write(path) as f:
            pq.write_table(tbl, f, row_group_size=row_group_size)
        return
    import os as _os

    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{_os.getpid()}"
    try:
        pq.write_table(tbl, tmp, row_group_size=row_group_size)
        _os.replace(tmp, path)
    finally:
        if _os.path.exists(tmp):
            _os.unlink(tmp)


def isdir(path: str) -> bool:
    if is_uri(path):
        f, p = get_fs(path)
        return f.isdir(p)
    return os.path.isdir(path)


def mtime_strict(path: str) -> float | None:
    """Modification time as a unix timestamp, or None when the
    protocol exposes none — callers that would bake the value into an
    IDENTITY (ingest ledgers) must treat None as "unavailable", not
    fabricate one."""
    if not is_uri(path):
        return os.path.getmtime(path)
    f, p = get_fs(path)
    try:
        m = f.modified(p)
        return m.timestamp() if hasattr(m, "timestamp") else float(m)
    except Exception:
        try:
            info = f.info(p)
            for k in ("mtime", "LastModified", "last_modified", "created"):
                v = info.get(k)
                if v is None:
                    continue
                return v.timestamp() if hasattr(v, "timestamp") else float(v)
        except Exception:
            pass
        return None


def mtime(path: str) -> float:
    """Like :func:`mtime_strict` but protocols without one report NOW —
    for the GC callers that means "too young to delete", the safe
    direction."""
    m = mtime_strict(path)
    if m is None:
        import time as _time

        return _time.time()
    return m


def ray_read_paths(paths) -> tuple[list, dict]:
    """``(paths, read_kwargs)`` for handing a SAME-protocol path list
    to a ``ray.data.read_*`` planner: URI lists get one fsspec-backed
    pyarrow filesystem (pickles into the read tasks) plus
    protocol-stripped paths — the readers reject URI strings outright.
    Plain local lists pass through untouched. One shared helper so the
    idiom cannot drift between Table.scan, the DV read path and
    ingest."""
    paths = list(paths)
    if not paths or not is_uri(paths[0]):
        return paths, {}
    filesystem, _ = arrow_fs(paths[0])
    return [get_fs(p)[1] for p in paths], {"filesystem": filesystem}


def rm_dir(path: str) -> None:
    """Remove a directory (and its files) if it exists."""
    if is_uri(path):
        f, p = get_fs(path)
        if f.exists(p):
            f.rm(p, recursive=True)
        return
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def _shim_fsspec_http() -> None:
    """fsspec's http module needs aiohttp; when aiohttp is absent,
    EVERY Ray read plan re-attempts the failing import (Ray's
    path_util catches only ModuleNotFoundError) and two threads
    planning reads concurrently can observe each other's partially
    initialized module — CPython's ``from X import Y`` fast path skips
    the import lock once sys.modules holds the entry — surfacing as an
    ImportError that escapes that catch and fails the read. Register
    an inert stand-in ONCE at import: Ray's isinstance probe then
    answers False (same outcome as "module absent") for every planner
    in the process, with no import ever raced again. A user actually
    constructing the HTTP filesystem gets a clear error instead of a
    torn import."""
    import importlib
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        importlib.import_module(name)
        return  # aiohttp present: the real module works
    except Exception:
        pass

    mod = types.ModuleType(name)

    class HTTPFileSystem:  # isinstance-only stand-in
        def __init__(self, *a, **k):
            raise ImportError(
                "aiohttp is required for fsspec HTTP filesystem support"
            )

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


_shim_fsspec_http()
