"""Engine configuration.

The reference switches dev/prod behavior through env vars
(``searcher.py:378-396``, ``embedder.py:21-25``, ``example.env``); our
equivalent is one explicit config object threaded through every op
(SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Tunables for table-maintenance ops.

    Sized for a multi-node cluster streaming ~100 TB; tests shrink
    ``target_fragment_bytes`` so small fixtures still exercise
    multi-fragment plans.
    """

    # Compaction / fragment sizing. Fragments are the unit of
    # parallelism AND of zone-map pruning: big enough to amortize file
    # open cost, small enough that one task's working set fits in a
    # worker heap. 256 MiB is the lakehouse-standard sweet spot.
    target_fragment_bytes: int = 256 * 1024 * 1024
    # A fragment at least this fraction of target size is "large
    # enough" and is not rewritten by compaction.
    compact_min_fill: float = 0.5
    # Byte budget is authoritative (token lists skew bytes/row —
    # SURVEY.md §4 "Skew"); row budget is a secondary clamp so
    # pathological tiny-row tables don't build million-row fragments.
    max_rows_per_fragment: int = 4_000_000

    # Clustering: bits per dimension for Z-order / Hilbert interleave.
    cluster_bits: int = 21
    # Default cluster key, per BASELINE.json north_star.
    cluster_columns: tuple[str, ...] = ("source", "n_tok", "doc_id")
    # Grouped clustering: cluster fragment groups of ~this many bytes
    # independently (each group = one bounded sort job + one lineage
    # record → resumable, and no single 100 TB global exchange).
    # "auto" (default) = groups of ``cluster_auto_group_bytes``; a
    # table smaller than one group budget still compiles to a single
    # global sort, so small tables keep strict total curve order while
    # the 100 TB path can never become one all-to-all exchange.
    # None = force one global sort regardless of size (strict order).
    cluster_group_bytes: int | str | None = "auto"
    # Group byte budget used by the "auto" mode. 64 GiB ≈ 256 fragments
    # at the 256 MiB target: one bounded sort job per group.
    cluster_auto_group_bytes: int = 64 * 1024 * 1024 * 1024
    # Grouped clustering: how many group sort jobs run concurrently
    # (each is an independent bounded Dataset pipeline; overlapping
    # them keeps the cluster busy while one group's write drains).
    cluster_group_concurrency: int = 4

    # MERGE: if the deduped source has at most this many keys, the key
    # set is broadcast (ray.put once, np.isin per batch) instead of
    # hash-shuffling the target side.
    merge_broadcast_max_keys: int = 4_000_000
    # Hash-shuffle bucket FLOOR when the source is too big to
    # broadcast; the actual count is sized from measured source bytes
    # (~256 MiB per bucket). A high floor makes tiny-source merges pay
    # fixed per-bucket exchange overhead for nothing (measured: 256
    # buckets made a 150k-row dedup cost 9x the fragment rewrite).
    merge_num_buckets: int = 8

    # Enrichment joins: a dimension side at most this big (measured
    # column-pruned Arrow bytes) is broadcast via ray.put; above it
    # ops/join.enrich_join falls back to the distributed hash_join so
    # an oversized "small" side can never blow the driver heap.
    broadcast_max_bytes: int = 256 * 1024 * 1024

    # Per-fragment bloom filter on doc_id, written as a
    # <fragment>.parquet.bloom sidecar (~bits_per_key/8 bytes per row:
    # 10 bits ≈ 0.8% FPR at k=7, ~160 KiB beside a 256 MiB fragment).
    # MERGE / DELETE / UPDATE rewrite tasks probe it and exit before
    # reading the Parquet when no key can be present — the pruning
    # zone maps can't provide on an UNCLUSTERED table. None disables.
    bloom_bits_per_key: int | None = 10

    # Pure-copy fan-out cap: compaction, COW fragment rewrites
    # (merge/delete/update) and the cluster sort are
    # read-decompress-filter-encode copies that can saturate the
    # memory bus before the cores — past saturation, more concurrent
    # copiers anti-scale (measured on a contended socket: merge
    # rewrite 40.3s@8 -> 75.4s@32 workers). "auto" probes the actual
    # bus once per process (ops/_fanout.measured_copy_cap) and stops
    # adding copiers at the MEASURED saturation point — a quiet wide
    # bus runs uncapped, a narrow one throttles. An explicit int is a
    # fixed per-node cap × alive nodes.
    memcpy_max_concurrency: int | str = "auto"

    # Parquet row-group size inside fragments — the unit of IN-fragment
    # predicate pruning: scan pushes the predicate to the Parquet
    # scanner, which skips row groups whose footer stats exclude it
    # (Table.row_group_prune_stats audits the effect). 32k rows ≈
    # dozens of skippable groups per 256 MiB fragment.
    row_group_rows: int = 32 * 1024

    # Snapshot expiry: keep at least this many trailing versions.
    expire_keep_last: int = 2

    # DELETE/UPDATE ``mode="auto"`` dispatch: if the metadata-only
    # match estimate (ops/analyze.py estimate_rows) is at most this
    # fraction of the table, take the deletion-vector path (write
    # O(matched rows)); above it, copy-on-write (rewriting beats
    # accumulating a mask over a large slice of every fragment).
    # 0.2 ≈ where one full-fragment rewrite costs less than carrying
    # and later materializing a 20% mask through scans + compaction.
    mutation_auto_dv_fraction: float = 0.2

    # Read path
    scan_columns: tuple[str, ...] = ("doc_id", "tokens", "n_tok", "source")

    # Parallelism hints (None = let Ray Data decide).
    read_override_num_blocks: int | None = None

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = EngineConfig()
