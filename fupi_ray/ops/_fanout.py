"""Bandwidth-aware fan-out control for pure-copy phases.

Compaction, COW fragment rewrites (MERGE / DELETE / UPDATE) and the
cluster sort are read-decompress-filter-encode copies: they saturate a
node's MEMORY BUS long before its cores. Past that point more
concurrent copiers just queue on the bus — measured on one socket,
merge rewrite took 40.3s at 8 workers but 75.4s at 32, and the grouped
cluster sort 23.8s vs 57.5s (SCALING_r03.json). Each node brings its
own bus, so the cap scales with alive-node count and a real multi-node
cluster is never throttled below its hardware; a single box stops
adding copiers at the measured saturation point instead of
anti-scaling.

Two enforcement shapes, matching the two fan-out shapes in the ops:

- :func:`run_capped` — sliding-window submission for raw
  ``@ray.remote`` per-fragment tasks (compact / merge / mutate);
- :func:`limit_dataset_cpu` — per-dataset
  ``execution_options.resource_limits`` for Dataset pipelines whose
  hot phase is a copy (the cluster sort), leaving the process-global
  DataContext untouched.
"""

from __future__ import annotations

import ray


_MEASURED_CAP: int | None = None
_PROBE_FLOOR = 8


@ray.remote(num_cpus=1, scheduling_strategy="SPREAD")
def _copy_probe_task(mb: int, loops: int) -> float:
    import time

    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    b = a.copy()  # both buffers faulted BEFORE timing (see below)
    t0 = time.perf_counter()
    for _ in range(loops):
        np.copyto(b, a)
    return (time.perf_counter() - t0) / max(loops, 1)


def measured_copy_cap(floor: int = _PROBE_FLOOR, probe_mb: int = 16) -> int:
    """One-time memory-bus saturation probe: run waves of memcpy tasks
    at doubling concurrency and keep the last level whose AGGREGATE
    copy throughput still improved ≥20% — the measured saturation
    point, not a guessed constant. A quiet 32-CPU bus typically
    sustains all 32 copiers (cap = cpus, no throttle); a contended or
    narrow bus stops the ramp early.

    Measurement hygiene (both effects measured on this host): (1) a
    worker's FIRST large page-fault burst can stall seconds (THP
    defrag / lazy zeroing), so every worker faults its buffers in an
    untimed warm-up wave; (2) wall-clock includes scheduling noise, so
    throughput is computed from per-task inner copy times. Buffers are
    small (2×16 MB per worker) but the fleet's combined working set
    (~1 GB at 32 workers) far exceeds L3 — the waves hit DRAM. Cached
    per driver process.

    Multi-node placement (round-5 review): the probe task is declared
    ``scheduling_strategy="SPREAD"``. Ray's DEFAULT strategy packs
    tasks onto as few nodes as possible, so a low-concurrency wave
    would land entirely on one node, saturate that one bus, and the
    ≥5%-gain early stop would freeze the cap at a single node's
    capacity for the whole cluster. With SPREAD every wave engages
    every node's bus proportionally, so the ramp keeps paying as long
    as the CLUSTER has headroom and the measured value genuinely sums
    per-node buses — it is used as the cluster-wide cap directly."""
    global _MEASURED_CAP
    if _MEASURED_CAP is not None:
        return _MEASURED_CAP
    try:
        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        return max(1, floor)
    if cpus <= floor:
        _MEASURED_CAP = max(1, cpus)
        return _MEASURED_CAP
    ray.get([_copy_probe_task.remote(probe_mb, 1) for _ in range(cpus)])
    levels, c = [], max(2, floor // 2)
    while c < cpus:
        levels.append(c)
        c *= 2
    levels.append(cpus)
    best_c, prev_bw = levels[0], 0.0
    for c in levels:
        # best-of-3 waves: transient host contention only ever LOWERS
        # observed throughput, so the max is the closest to capacity
        bw = 0.0
        for _ in range(3):
            dts = ray.get([_copy_probe_task.remote(probe_mb, 6) for _ in range(c)])
            bw = max(bw, c / max(sum(dts) / len(dts), 1e-9))
        # stop only where doubling copiers stops paying: a plateau or a
        # decline (the r3 pathology was an outright DROP — 40s@8 vs
        # 75s@32 merge). Any real gain still shortens wall-clock.
        if prev_bw and bw < prev_bw * 1.05:
            break
        best_c, prev_bw = c, bw
    _MEASURED_CAP = max(floor, best_c)
    return _MEASURED_CAP


def copy_concurrency_cap(per_node_cap: int | str) -> int:
    """Cluster-wide cap on concurrent pure-copy tasks. ``"auto"`` (the
    default config) probes the actual bus once per process and returns
    the measured saturation concurrency; an explicit int is the legacy
    per-node value × alive nodes, clamped to total CPUs."""
    if per_node_cap == "auto":
        return measured_copy_cap()
    try:
        nodes = sum(1 for n in ray.nodes() if n.get("Alive"))
        cpus = int(ray.cluster_resources().get("CPU", per_node_cap))
    except Exception:
        return max(1, per_node_cap)
    return max(1, min(per_node_cap * max(nodes, 1), max(cpus, 1)))


def run_capped(remote_fn, args_list: list[tuple], cap: int) -> list:
    """``ray.get`` over ``remote_fn.remote(*args)`` for every args
    tuple, with at most ``cap`` tasks in flight. Results come back in
    input order. Equivalent to the uncapped comprehension when
    ``cap >= len(args_list)``, minus the bus contention when not.

    Copy tasks are forced ``SPREAD``: their inputs are fragment PATHS
    on shared storage (no object locality to exploit), so Ray's
    default node-packing would stack a capped fleet onto few nodes —
    the exact single-bus saturation the cap exists to avoid — while
    the other nodes' buses idle. SPREAD makes ``cap`` copiers use
    ~cap/N buses per node, which is the model ``copy_concurrency_cap``
    assumes when it scales the cap by alive-node count."""
    results: list = [None] * len(args_list)
    if not args_list:
        return results
    remote_fn = remote_fn.options(scheduling_strategy="SPREAD")
    cap = max(1, int(cap))
    pending: dict = {}
    for i, args in enumerate(args_list):
        if len(pending) >= cap:
            done, _ = ray.wait(list(pending.keys()), num_returns=1)
            for ref in done:
                results[pending.pop(ref)] = ray.get(ref)
        pending[remote_fn.remote(*args)] = i
    while pending:
        done, _ = ray.wait(list(pending.keys()), num_returns=1)
        for ref in done:
            results[pending.pop(ref)] = ray.get(ref)
    return results


def limit_dataset_cpu(ds: "ray.data.Dataset", cap: int) -> "ray.data.Dataset":
    """Cap the streaming executor's CPU budget for THIS dataset (and
    its derived transforms) without touching the global DataContext —
    each Dataset snapshots its own context at creation. No-op when the
    cap wouldn't bite (cap >= cluster CPUs) so the fast path stays
    allocation-free."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus and cap >= cpus:
        return ds
    from ray.data._internal.execution.interfaces import ExecutionResources

    ds.context.execution_options.resource_limits = ExecutionResources.for_limits(
        cpu=max(1, int(cap))
    )
    return ds
