"""Per-fragment bloom filters on ``doc_id`` — point-lookup pruning
beyond zone maps.

Zone maps (manifest.py) prune fragments by min/max range, which is
precise only after clustering on the key. On an UNCLUSTERED table a
MERGE / DELETE by key sees every fragment's doc_id range overlap the
key set, so every fragment is read and rewritten even when it holds
no matched row. The reference inherits the same behavior from Lance
(full-fragment rewrites on `create_table(mode='overwrite')`,
/root/reference/fupi/utils.py:39-49). A per-fragment bloom filter
answers "could ANY of these keys be in this fragment?" with no false
negatives, so a rewrite task can exit before touching the Parquet —
the same role Iceberg/Parquet bloom filters play for point predicates.

Layout: one side file per fragment at ``<fragment>.parquet.bloom``
(path-derived — no manifest/shard schema change, and the sidecar is
GC'd with its fragment by snapshot expiry). Format: 16-byte header
``FBF1 | uint32 k | uint64 m_bits`` + little-endian uint64 words.

Hashing: the engine-wide ``stable_hash`` (SipHash-1-3 via pandas,
process-stable) feeds double hashing — ``pos_i = (h + i*h2) % m`` with
``h2`` odd — so build and probe agree everywhere and no per-row Python
runs in either direction. Build is one ``np.bitwise_or.at`` scatter;
probe is one gather + bit test per (key × k).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"FBF1"
DEFAULT_K = 7  # with 10 bits/key: FPR ~= (1 - e^(-7/10))^7 ~= 0.8%
_HEADER = struct.Struct("<4sIQ")


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) probe positions via double hashing over uint64."""
    h1 = hashes.astype(np.uint64, copy=False)
    # independent-ish second hash: mix the high bits down, force odd
    h2 = ((h1 >> np.uint64(17)) ^ (h1 << np.uint64(13))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def build(hashes: np.ndarray, bits_per_key: int = 10, k: int = DEFAULT_K) -> bytes:
    """Serialize a bloom filter over pre-hashed keys (uint64)."""
    n = int(len(hashes))
    m_bits = max(1024, bits_per_key * max(n, 1))
    m_bits = ((m_bits + 63) // 64) * 64
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if n:
        pos = _positions(np.asarray(hashes), m_bits, k)
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).ravel(), np.uint64(1) << (pos & np.uint64(63)).ravel()
        )
    return _HEADER.pack(MAGIC, k, m_bits) + words.tobytes()


def _parse(blob: bytes) -> tuple[int, int, np.ndarray]:
    magic, k, m_bits = _HEADER.unpack_from(blob)
    if magic != MAGIC:
        raise ValueError("not a bloom sidecar (bad magic)")
    words = np.frombuffer(blob, dtype=np.uint64, offset=_HEADER.size)
    if len(words) != m_bits // 64:
        raise ValueError("bloom sidecar truncated")
    return k, m_bits, words


def contains_mask(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    """Per-key possible-membership mask (no false negatives)."""
    k, m_bits, words = _parse(blob)
    hashes = np.asarray(hashes)
    out = np.empty(len(hashes), dtype=bool)
    # chunk so the (k, n) position matrix stays small
    for s in range(0, len(hashes), 1 << 16):
        h = hashes[s : s + (1 << 16)]
        pos = _positions(h, m_bits, k)
        bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
        out[s : s + (1 << 16)] = bits.all(axis=0)
    return out


def may_contain_any(blob: bytes, hashes: np.ndarray) -> bool:
    """Could ANY of the keys be present? Early-exits on first hit."""
    k, m_bits, words = _parse(blob)
    hashes = np.asarray(hashes)
    for s in range(0, len(hashes), 1 << 16):
        h = hashes[s : s + (1 << 16)]
        pos = _positions(h, m_bits, k)
        bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
        if bool(bits.all(axis=0).any()):
            return True
    return False


# --- sidecar I/O -------------------------------------------------------------


def sidecar_path(parquet_path: str) -> str:
    return parquet_path + ".bloom"


def write_sidecar(
    parquet_abs_path: str, doc_ids, bits_per_key: int, k: int = DEFAULT_K
) -> None:
    """Build + write the bloom beside the fragment. ``doc_ids`` is an
    Arrow/numpy string column or a precomputed uint64 hash array."""
    from fupi_ray.functions.hashing import stable_hash
    from fupi_ray.state import fs as _fs

    arr = np.asarray(doc_ids) if not hasattr(doc_ids, "to_numpy") else None
    if arr is not None and arr.dtype == np.uint64:
        hashes = arr
    else:
        hashes = stable_hash(doc_ids)
    _fs.write_bytes(sidecar_path(parquet_abs_path), build(hashes, bits_per_key, k))


def read_sidecar(parquet_abs_path: str) -> bytes | None:
    """Sidecar contents, or None when the fragment has no bloom (older
    fragment / blooms disabled / unreadable sidecar — all of which mean
    "cannot prune", never an error)."""
    from fupi_ray.state import fs as _fs

    p = sidecar_path(parquet_abs_path)
    try:
        if not _fs.exists(p):
            return None
        blob = _fs.read_bytes(p)
        _parse(blob)  # validate before anyone trusts it
        return blob
    except (OSError, ValueError):
        return None
