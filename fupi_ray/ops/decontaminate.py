"""decontaminate_table: benchmark decontamination as a committing
table op.

The GPT-3 appendix rule — drop every training document sharing an
n-gram with an evaluation set — exists in this repo as a *query* over
the text corpus (``pipelines/queries.q_decontaminate``, 13-gram rule).
A training-data lakehouse needs it as a *table maintenance* op over
the north-star TOKEN sequences: mark every document whose token stream
contains any eval-set window, and remove them in one atomic
MERGE-delete pinned to the scanned snapshot.

Scale shape:

1. **Eval grams broadcast once.** The eval side is benchmark-sized by
   contract (thousands of sequences, not a corpus): its distinct
   window hashes (64-bit, token-byte windows via the same
   ``textkernels.list_windows`` kernel the window-dedup op uses) are
   collected, sorted, and ``ray.put`` once — every corpus task probes
   the same object-store buffer; nothing is re-shipped per batch.
2. **One corpus scan, no exchange.** Each batch extracts stride-1
   window hashes and membership-probes them against the sorted eval
   array (``searchsorted`` + equality — two vectorized passes); hits
   fold to per-doc counts with ``bincount``. Only the contaminated
   ``doc_id`` keys leave the task.
3. **Delete** via ``merge_into(when_matched="delete",
   expected_parent=...)``: zone-map + bloom pruning touches only
   fragments that can hold a victim; ``mode="dv"`` writes O(deleted
   positions) bytes.

Membership is by 64-bit window hash (`windowspans.row_hash64`), the
same identity the window-dedup detection uses: a false positive needs
a 64-bit collision between a corpus window and an eval window
(~5e-10 at 1e10 window-pairs) — the trade that lets the corpus side
ship zero window bytes. ``min_hits`` raises the bar to k distinct
window positions for noisy eval sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fupi_ray.ops.merge import merge_into
from fupi_ray.ops.windowdedup import _block_windows
from fupi_ray.table import Table


def eval_window_hashes(
    eval_ds: ray.data.Dataset, width: int, tokens_col: str = "tokens"
) -> np.ndarray:
    """Sorted distinct 64-bit window hashes of the eval sequences.
    Per-block unique happens in the tasks; the driver only merges the
    (benchmark-sized) distinct sets. Sequences shorter than ``width``
    contribute their windows only once padded by the caller — by the
    GPT-3 rule they are simply unmatched."""

    def block_hashes(batch: pa.Table) -> pa.Table:
        b = batch if tokens_col == "tokens" else batch.rename_columns(
            ["tokens" if c == tokens_col else c for c in batch.column_names]
        )
        bw = _block_windows(b, width, 1)
        h = np.unique(bw[1]) if bw is not None else np.empty(0, np.uint64)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    df = eval_ds.map_batches(block_hashes, batch_format="pyarrow").to_pandas()
    if df.empty:
        return np.empty(0, np.uint64)
    return np.unique(df["h"].to_numpy(dtype=np.int64).view(np.uint64))


def decontaminate_table(
    table: Table,
    eval_ds: ray.data.Dataset,
    width: int = 13,
    min_hits: int = 1,
    mode: str = "dv",
    job_id: str | None = None,
) -> dict:
    """Remove every document whose token stream shares a ``width``-token
    window with ``eval_ds`` (a Dataset with a ``tokens`` list column);
    returns ``{version, rows_deleted, eval_grams}``. ``version`` is
    unchanged (no commit) when nothing is contaminated. The delete is
    pinned to the snapshot the detection scanned — a concurrent commit
    fails the op loudly (``CommitError``); re-run to retry."""
    parent = table.latest_version()
    grams = eval_window_hashes(eval_ds, width)
    if len(grams) == 0:
        return {"version": parent, "rows_deleted": 0, "eval_grams": 0}
    grams_ref = ray.put(grams)

    def contaminated(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field("doc_id").type
        bw = _block_windows(batch, width, 1)
        if bw is None:
            return pa.table({"doc_id": pa.array([], id_type)})
        _, h, doc_idx, _ = bw
        ev = ray.get(grams_ref)
        pos = np.searchsorted(ev, h)
        pos[pos == len(ev)] = 0
        member = ev[pos] == h
        hits = np.bincount(doc_idx[member], minlength=batch.num_rows)
        return pa.table({"doc_id": batch["doc_id"].filter(pa.array(hits >= min_hits))})

    drop = (
        table.scan(parent, columns=["doc_id", "tokens"])
        .map_batches(contaminated, batch_format="pyarrow")
        .materialize()
    )
    n_drop = drop.count()
    if n_drop == 0:
        return {"version": parent, "rows_deleted": 0, "eval_grams": int(len(grams))}
    version = merge_into(
        table,
        drop,
        job_id=job_id or f"decon-v{parent}",
        mode=mode,
        when_matched="delete",
        expected_parent=parent,
    )
    return {
        "version": version,
        "rows_deleted": n_drop,
        "eval_grams": int(len(grams)),
    }
