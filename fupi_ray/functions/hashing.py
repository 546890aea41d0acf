"""Stable vectorized hashing + space-filling-curve key math.

Everything here must be deterministic across processes and runs (no
``PYTHONHASHSEED`` dependence): fragment bucketing, MERGE shuffles and
cluster keys all rely on it (SURVEY.md §2.2 M4 — avoid global
sequential ids; derive keys by hashing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash(values) -> np.ndarray:
    """Deterministic 64-bit hash of a string/int column → uint64 ndarray.

    Uses pandas' SipHash-1-3 with its fixed key, which is stable across
    processes (unlike Python ``hash()``); vectorized, no per-row Python.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return pd.util.hash_array(arr.astype(np.uint64, copy=False))
    return pd.util.hash_array(arr.astype(object), categorize=False)


# ---------------------------------------------------------------------------
# 3-D Morton (Z-order) bit interleave, 21 bits/dim → 63-bit key.
# Classic magic-mask bit spreading, fully vectorized over uint64 arrays.
# ---------------------------------------------------------------------------

_SPREAD_MASKS = (
    (32, np.uint64(0x1F00000000FFFF)),
    (16, np.uint64(0x1F0000FF0000FF)),
    (8, np.uint64(0x100F00F00F00F00F)),
    (4, np.uint64(0x10C30C30C30C30C3)),
    (2, np.uint64(0x1249249249249249)),
)
_MASK21 = np.uint64(0x1FFFFF)


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits of x to every 3rd bit position."""
    x = x.astype(np.uint64, copy=True) & _MASK21
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << np.uint64(shift))) & mask
    return x


def zorder_key(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, bits: int = 21) -> np.ndarray:
    """Interleave three ``bits``-wide dimensions into one Z-order key.

    d0 is the most significant dimension. Inputs are clamped to
    ``bits`` bits. Returns uint64 (used as int64-safe: 3*21=63 bits).
    """
    shift = np.uint64(21 - bits)
    a = (np.asarray(d0, dtype=np.uint64) & ((np.uint64(1) << np.uint64(bits)) - np.uint64(1))) << shift
    b = (np.asarray(d1, dtype=np.uint64) & ((np.uint64(1) << np.uint64(bits)) - np.uint64(1))) << shift
    c = (np.asarray(d2, dtype=np.uint64) & ((np.uint64(1) << np.uint64(bits)) - np.uint64(1))) << shift
    return (_spread3(a) << np.uint64(2)) | (_spread3(b) << np.uint64(1)) | _spread3(c)


# ---------------------------------------------------------------------------
# Hilbert curve key (Skilling's public-domain transform, vectorized).
# Better locality than Z-order: no long diagonal jumps between octants.
# ---------------------------------------------------------------------------


def hilbert_key(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, bits: int = 21) -> np.ndarray:
    """Map three ``bits``-wide dimensions onto the 3-D Hilbert curve.

    Vectorized Skilling AxesToTranspose (loop over bit planes only,
    numpy ops per plane), then bit-interleave of the transposed index.
    """
    n = 3
    mask = (np.uint64(1) << np.uint64(bits)) - np.uint64(1)
    X = [
        np.asarray(d0, dtype=np.uint64) & mask,
        np.asarray(d1, dtype=np.uint64) & mask,
        np.asarray(d2, dtype=np.uint64) & mask,
    ]
    X = [x.copy() for x in X]
    M = np.uint64(1) << np.uint64(bits - 1)

    # Inverse undo excess work
    Q = M
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        for i in range(n):
            t = (X[i] & Q) != 0
            flip = np.where(t, P, np.uint64(0))
            X[0] ^= flip  # invert low bits of X[0] where bit set
            ex = np.where(t, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] ^= ex
            X[i] ^= ex
        Q >>= one

    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > one:
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - one), t)
        Q >>= one
    for i in range(n):
        X[i] ^= t

    # Interleave transposed index: X[0] most significant within each plane.
    pad = np.uint64(21 - bits)
    return (
        (_spread3(X[0] << pad) << np.uint64(2))
        | (_spread3(X[1] << pad) << np.uint64(1))
        | _spread3(X[2] << pad)
    ) >> (np.uint64(3) * pad)


_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array — a cheap, fully
    vectorized 64-bit mixer (stand-in for per-permutation universal
    hashing in MinHash; object-dtype Mersenne-prime math costs a python
    bigint op per element)."""
    with np.errstate(over="ignore"):
        x = (np.asarray(x, dtype=np.uint64) + _M1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _M2).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _M3).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def band_salts(bands: int) -> np.ndarray:
    """Per-band fold salts for LSH banding: the band INDEX is folded
    into the 64-bit band key instead of shipped as its own exchange
    column. ONE shared definition — both MinHash banding paths
    (ops/dedupdocs.band_rows, stages/dedup.MinHashStage) must stay
    bit-identical or their keys silently diverge."""
    with np.errstate(over="ignore"):
        return mix64(np.arange(1, bands + 1, dtype=np.uint64) * _M1)


def mix64_into(x: np.ndarray, tmp: np.ndarray, out: np.ndarray) -> np.ndarray:
    """``mix64`` with caller-provided scratch: identical math (splitmix64
    finalizer), zero allocations. ``tmp``/``out`` must match ``x``'s
    shape; ``out is x`` is allowed. The hot MinHash loop calls this per
    permutation so the working set stays one gram-array wide (L3-sized)
    instead of materializing ~10 temporaries per chunk."""
    with np.errstate(over="ignore"):
        np.add(x, _M1, out=out)
        np.right_shift(out, np.uint64(30), out=tmp)
        np.bitwise_xor(out, tmp, out=out)
        np.multiply(out, _M2, out=out)
        np.right_shift(out, np.uint64(27), out=tmp)
        np.bitwise_xor(out, tmp, out=out)
        np.multiply(out, _M3, out=out)
        np.right_shift(out, np.uint64(31), out=tmp)
        np.bitwise_xor(out, tmp, out=out)
    return out


def quantize_to_bits(values: np.ndarray, lo: float, hi: float, bits: int = 21) -> np.ndarray:
    """Linearly scale numeric values in [lo, hi] to ``bits``-bit ints."""
    v = np.asarray(values, dtype=np.float64)
    span = max(hi - lo, 1e-12)
    maxv = float((1 << bits) - 1)
    q = np.clip((v - lo) / span * maxv, 0.0, maxv)
    return q.astype(np.uint64)
