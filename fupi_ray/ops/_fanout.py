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


def copy_concurrency_cap(per_node_cap: int) -> int:
    """Cluster-wide cap on concurrent pure-copy tasks: the configured
    per-node value × alive nodes, clamped to total CPUs."""
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
    ``cap >= len(args_list)``, minus the bus contention when not."""
    results: list = [None] * len(args_list)
    if not args_list:
        return results
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
