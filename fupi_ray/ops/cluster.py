"""Z-order / Hilbert clustering: interleaved sort key → global sort →
range-partitioned fragments with tight zone maps.

The reference's tables get data-skipping implicitly from Lance fragment
stats (SURVEY.md §2.5 note); our engine makes the layout explicit per
the north star: interleave bit-planes of ``(source, n_tok,
hash(doc_id))``, globally sort the table by the curve key (the one
all-to-all exchange this op fundamentally requires), and rewrite
fragments so each covers a small hyper-rectangle of the key space —
then zone-map pruning answers ``source = x AND n_tok BETWEEN a AND b``
scans by skipping most fragments.

The key-interleave stage is the engine's analogue of the reference's
stateful embedding stage (fupi/embedders.py:35-63 — load once, apply
per batch, SURVEY.md §2.3 T1): an actor pool holding the source→code
dictionary, vectorized numpy bit-spreading per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from fupi_ray.functions.hashing import hilbert_key, quantize_to_bits, stable_hash, zorder_key
from fupi_ray.table import Table, write_dataset_fragments

N_TOK_LO, N_TOK_HI = 0.0, 8192.0


class KeyInterleaver:
    """Actor-pool map_batches stage: adds the space-filling-curve key.

    State built once per actor in ``__init__`` (the source→code dict
    arrives by broadcast handle — ``ray.put`` once on the driver, read
    once per actor, never re-shipped per batch)."""

    def __init__(self, source_codes_ref, curve: str = "zorder", bits: int = 21):
        codes = ray.get(source_codes_ref) if not isinstance(source_codes_ref, dict) else source_codes_ref
        self.codes = codes
        self.curve = curve
        self.bits = bits
        n = max(len(codes), 2)
        self.code_scale = (1 << bits) // n

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        d0 = np.array([self.codes.get(s, 0) for s in src], dtype=np.uint64) * np.uint64(self.code_scale)
        d1 = quantize_to_bits(batch["n_tok"].to_numpy(), N_TOK_LO, N_TOK_HI, self.bits)
        d2 = stable_hash(batch["doc_id"]) >> np.uint64(64 - self.bits)
        fn = hilbert_key if self.curve == "hilbert" else zorder_key
        key = fn(d0, d1, d2, bits=self.bits)
        return batch.append_column("_ckey", pa.array(key.astype(np.int64)))


def cluster(
    table: Table,
    curve: str = "zorder",
    version: int | None = None,
    job_id: str | None = None,
) -> int:
    """Rewrite the table clustered by the interleaved key; new version.

    Content-preserving: only physical order and fragment boundaries
    change. One global sort (unavoidable for clustering); everything
    else streams.
    """
    cfg = table.config
    parent = table.latest_version() if version is None else version

    # source dictionary: tiny cardinality → collect distinct values once
    uniq = table.scan(parent, columns=["source"]).unique("source")
    vals = sorted(v["source"] if isinstance(v, dict) else v for v in uniq)
    codes = {s: i for i, s in enumerate(vals)}
    codes_ref = ray.put(codes)

    ds = table.scan(parent)
    keyed = ds.map_batches(
        KeyInterleaver,
        fn_constructor_args=(codes_ref, curve, cfg.cluster_bits),
        batch_format="pyarrow",
        concurrency=(1, 8),
        zero_copy_batch=True,
    )
    clustered = keyed.sort("_ckey").map_batches(
        lambda t: t.drop_columns(["_ckey"]), batch_format="pyarrow"
    )
    prefix = f"cl-{job_id or f'cluster-v{parent}'}"
    frags = write_dataset_fragments(clustered, table.table_dir, prefix)
    old_paths = {f.path for f in table.manifest(parent).fragments}
    return table.commit_fragment_swap(
        old_paths,
        frags,
        operation=f"cluster-{curve}",
        expected_parent=parent,
        properties={"curve": curve, "bits": cfg.cluster_bits, "sources": len(codes)},
    )
