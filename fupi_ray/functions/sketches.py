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


# -- DDSketch quantiles (Masson, Rim & Lee, VLDB 2019) -----------------------
#
# Relative-error quantile sketch: a value x > 0 lands in geometric
# bucket k = ceil(log_gamma(x)), so reporting the bucket midpoint
# 2*gamma^k/(gamma+1) is within (gamma-1)/(gamma+1) RELATIVE error of
# x — gamma=1.02 gives ~1%. Buckets are kept sparse (sorted int64
# key array + int64 count array): a float64's full positive range
# spans only ~74k buckets at gamma=1.02 and real columns touch a few
# hundred, so no collapsing is needed. Merge = key-wise count sum —
# associative and layout-independent, the zone-map/HLL contract.
# Negative values mirror into negative-side buckets, zeros get a
# dedicated counter; exact count/min/max/sum ride along for free.
#
# State dict: {"keys": int64[], "counts": int64[], "zero": int,
# "count": int, "vmin": float, "vmax": float, "sum": float}.
# Key encoding: bucket k of positive values -> 2k; of negative
# values -> 2k+1 (k itself may be negative; any int64 works).

QSK_GAMMA = 1.02


def qsk_empty() -> dict:
    return {
        "keys": np.empty(0, dtype=np.int64),
        "counts": np.empty(0, dtype=np.int64),
        "zero": 0,
        "count": 0,
        "vmin": np.inf,
        "vmax": -np.inf,
        "sum": 0.0,
    }


def qsk_partial(values, gamma: float = QSK_GAMMA) -> dict:
    """One block's sketch. ``values`` is any numeric pyarrow array /
    numpy array; nulls and NaNs are dropped (SQL aggregate
    convention). One log + one ceil + one unique pass — flat numpy."""
    x = np.asarray(values, dtype=np.float64)
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return qsk_empty()
    lg = np.log(gamma)
    pos = x > 0
    neg = x < 0
    nzero = int(len(x) - np.count_nonzero(pos) - np.count_nonzero(neg))
    kpos = np.ceil(np.log(x[pos]) / lg).astype(np.int64) * 2
    kneg = np.ceil(np.log(-x[neg]) / lg).astype(np.int64) * 2 + 1
    keys, counts = np.unique(np.concatenate([kpos, kneg]), return_counts=True)
    return {
        "keys": keys,
        "counts": counts.astype(np.int64),
        "zero": nzero,
        "count": int(len(x)),
        "vmin": float(x.min()),
        "vmax": float(x.max()),
        "sum": float(x.sum()),
    }


def qsk_merge(a: dict, b: dict) -> dict:
    keys = np.concatenate([a["keys"], b["keys"]])
    counts = np.concatenate([a["counts"], b["counts"]])
    uk, inv = np.unique(keys, return_inverse=True)
    uc = np.zeros(len(uk), dtype=np.int64)
    np.add.at(uc, inv, counts)
    return {
        "keys": uk,
        "counts": uc,
        "zero": a["zero"] + b["zero"],
        "count": a["count"] + b["count"],
        "vmin": min(a["vmin"], b["vmin"]),
        "vmax": max(a["vmax"], b["vmax"]),
        "sum": a["sum"] + b["sum"],
    }


def qsk_quantiles(
    state: dict, qs, gamma: float = QSK_GAMMA
) -> list[float]:
    """Quantile estimates from a merged sketch — each within
    (gamma-1)/(gamma+1) relative error of the true order statistic.
    The exact vmin/vmax carried in the state clamp the tails, so
    q=0 / q=1 are exact."""
    if state["count"] == 0:
        return [float("nan") for _ in qs]
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
    out = []
    for q in qs:
        if q <= 0.0:
            out.append(state["vmin"])
            continue
        if q >= 1.0:
            out.append(state["vmax"])
            continue
        rank = q * (state["count"] - 1)
        i = int(np.searchsorted(cum, rank + 1.0, side="left"))
        v = float(vals[min(i, len(vals) - 1)])
        out.append(min(max(v, state["vmin"]), state["vmax"]))
    return out


# -- Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. 2012) ----
#
# Bounded-state frequent-items sketch: keep at most k counters; when a
# block has more distinct values, subtract the (k+1)-th largest count
# from every counter and drop the non-positives, accumulating the
# subtracted mass as ``residual``. Counters are then LOWER bounds on
# true frequencies and counter+residual is an UPPER bound; any value
# with true count > residual is guaranteed to survive. Merge = sum
# counters by key, re-compress, add residuals — associative up to the
# error bound, which the state carries explicitly, so the caller never
# has to trust an unstated epsilon. The scale story is the usual one:
# exact top-k over 10^12 rows is a distinct-key exchange; this is a
# fixed-k array per fragment.

def mg_partial(values, k: int = 256) -> dict:
    """One block's summary: exact value counts compressed to ≤k
    counters. ``values``: pyarrow/numpy array of strings or ints."""
    arr = np.asarray(values)
    n = int(len(arr))
    if n == 0:
        return {"keys": [], "counts": np.empty(0, np.int64), "residual": 0, "n": 0}
    uk, uc = np.unique(arr, return_counts=True)
    return _mg_compress(uk, uc.astype(np.int64), 0, n, k)


def _mg_compress(keys, counts: np.ndarray, residual: int, n: int, k: int) -> dict:
    if len(keys) > k:
        # subtract the (k+1)-th largest count from all counters (the
        # classic Misra-Gries decrement, batched): at most k survive.
        # Each surviving counter loses exactly kth and each dropped key
        # had count <= kth, so ONE compression underestimates any true
        # count by at most kth — residual accumulates Σ kth across
        # compressions, the standard mergeable-summary error bound
        kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
        keep = counts > kth
        residual += int(kth)
        keys, counts = keys[keep], counts[keep] - kth
    return {
        "keys": list(map(str, keys)) if len(keys) and not isinstance(keys[0], str) else list(keys),
        "counts": counts,
        "residual": int(residual),
        "n": int(n),
    }


def mg_merge(a: dict, b: dict, k: int = 256) -> dict:
    keys = np.array(list(a["keys"]) + list(b["keys"]), dtype=object)
    counts = np.concatenate(
        [np.asarray(a["counts"], np.int64), np.asarray(b["counts"], np.int64)]
    )
    if len(keys):
        uk, inv = np.unique(keys.astype(str), return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, counts)
    else:
        uk, uc = np.array([], dtype=object), np.empty(0, np.int64)
    return _mg_compress(
        uk, uc, a["residual"] + b["residual"], a["n"] + b["n"], k
    )


def mg_heavy_hitters(state: dict, min_fraction: float = 0.01) -> list[dict]:
    """Values whose frequency COULD exceed ``min_fraction`` of rows,
    with their count bounds: ``lower`` (guaranteed) and ``upper``
    (lower + residual). Sorted by lower bound, descending. Complete:
    any value with true count > residual is present."""
    n = max(state["n"], 1)
    thr = min_fraction * n
    out = [
        {
            "value": key,
            "lower": int(c),
            "upper": int(c) + state["residual"],
            "fraction_lower": round(int(c) / n, 6),
        }
        for key, c in zip(state["keys"], np.asarray(state["counts"]))
        if int(c) + state["residual"] >= thr
    ]
    return sorted(out, key=lambda d: -d["lower"])
