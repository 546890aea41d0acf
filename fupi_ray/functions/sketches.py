"""Distributed sketches for 100-TB-scale approximate analytics.

HyperLogLog distinct counting: the exact two-exchange distinct count
(see ``queries.q_distinct_count``) moves every distinct key; at corpus
scale the HLL register array (2^p bytes, p=14 → 16 KiB) replaces that
exchange with a constant-size mergeable state per block — the classic
sketch trade (Flajolet et al. 2007; register-max merge is associative
and layout-independent, so the estimate is deterministic across
cluster sizes).

All kernels are flat numpy: one stable_hash pass, vectorized
leading-zero counts (32-bit halves via exact float64 log2 — float64
represents 32-bit ints exactly, so floor(log2) never crosses an
integer boundary), one scatter-max.
"""

from __future__ import annotations

import numpy as np

from fupi_ray.functions.hashing import stable_hash


def _hb32(x: np.ndarray) -> np.ndarray:
    """Highest set bit (floor log2) of 32-bit values; -1 for 0."""
    out = np.full(len(x), -1, dtype=np.int64)
    nz = x > 0
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64)
    return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading zeros of uint64 values (64 for 0), vectorized."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hb = np.where(hi > 0, 32 + _hb32(hi), _hb32(lo))
    return np.int64(63) - hb


def hll_partial(values, p: int = 14) -> np.ndarray:
    """One block's HLL register array (uint8, length 2^p)."""
    h = stable_hash(values)
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rho = np.minimum(_clz64(rest), 64 - p) + 1
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet estimator with linear-counting small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hll_aggregate_fn(on: str, p: int = 14, name: str = "approx_distinct"):
    """Ray ``AggregateFn`` computing an HLL distinct-count estimate of
    column ``on`` per group: constant 2^p-byte state per (group,
    block), register-max merge — never a distinct-key exchange."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: np.zeros(1 << p, dtype=np.uint8),
        merge=hll_merge,
        accumulate_block=lambda regs, block: hll_merge(
            regs, hll_partial(block[on], p)
        ),
        finalize=lambda regs: float(hll_estimate(regs)),
        name=name,
    )
