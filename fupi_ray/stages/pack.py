"""Sequence packing: concat-and-chunk token sequences into fixed
context-length training examples.

The reference stops at per-document token sequences (its LanceDB rows
are one embedding unit per text chunk, /root/reference/fupi/data.py);
an LLM *training* pipeline additionally packs those variable-length
sequences into fixed ``context_len`` examples so no attention FLOPs
are spent on padding. This stage implements the standard
concat-and-chunk scheme (GPT-style packed pretraining): within each
batch, all token lists are concatenated in order and re-chunked into
rows of exactly ``context_len`` tokens, with the original document
boundaries carried as a ``boundaries`` list column (local offsets of
each document start inside the packed row) plus the contributing
``doc_ids`` — exactly what an attention-mask-reset data loader needs.

Scale shape: packing is PER BLOCK (one ``map_batches`` call, no
exchange): the whole kernel is flat-buffer numpy — one zero-copy view
of the Arrow list values, one reshape, two ``searchsorted`` calls for
the boundary bookkeeping; no per-row Python. Each block wastes at most
``context_len - 1`` trailing tokens (``drop_remainder=True``) or emits
one short row (False); at the 128 MiB default block size that is a
<0.01% waste bound. Cross-block carryover would need a stateful chain
(an ordered actor pipeline) for <1e-6 gain — deliberately not done.

For oracle-checkable determinism (packed-row COUNTS independent of Ray
blocking), group by a key whose groups must pack contiguously first:
``ds.groupby("source").map_groups(packer)`` — then per-source row
counts are exactly ``sum(n_tok) // context_len``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, absolute start offsets) of a list<int32> column,
    zero-copy where Arrow allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        lst = col
    else:
        raise TypeError(f"tokens column is {col.type}, expected a list type")
    # account for a sliced array: offsets[0] need not be 0
    offs = np.asarray(lst.offsets)
    values = np.asarray(lst.values)[offs[0] : offs[-1]]
    return values, offs - offs[0]


def pack_batch(
    batch: pa.Table,
    context_len: int,
    drop_remainder: bool = True,
    token_col: str = "tokens",
) -> pa.Table:
    """Pack one Arrow batch; see module docstring for semantics."""
    values, offs = _flat_tokens(batch[token_col])
    total = int(offs[-1])
    n_full, rem = divmod(total, context_len)
    n_rows = n_full + (1 if (rem and not drop_remainder) else 0)
    if n_rows == 0:
        return pa.table(
            {
                "pack_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "n_tok": pa.array([], pa.int32()),
                "n_docs": pa.array([], pa.int32()),
                "boundaries": pa.array([], pa.list_(pa.int32())),
                "doc_ids": pa.array([], pa.list_(pa.string())),
                "source": pa.array([], pa.string()),
            }
        )
    used = n_full * context_len if drop_remainder else total

    # packed token rows: one offsets ramp over the flat buffer
    row_offs = np.minimum(
        np.arange(n_rows + 1, dtype=np.int64) * context_len, used
    )
    tokens = pa.ListArray.from_arrays(
        pa.array(row_offs, pa.int64()).cast(pa.int32()),
        pa.array(values[:used], pa.int32()),
    ).cast(pa.list_(pa.int32()))

    # document starts that fall inside the emitted region, assigned to
    # rows by integer division; per-row grouping via ONE searchsorted
    starts = offs[:-1].astype(np.int64)
    keep = starts < used
    starts_in = starts[keep]
    bound_offs = np.searchsorted(starts_in, row_offs)
    local = (starts_in % context_len).astype(np.int32)
    boundaries = pa.ListArray.from_arrays(
        pa.array(bound_offs, pa.int64()).cast(pa.int32()), pa.array(local, pa.int32())
    ).cast(pa.list_(pa.int32()))
    doc_ids_in = batch["doc_id"].combine_chunks() if isinstance(
        batch["doc_id"], pa.ChunkedArray
    ) else batch["doc_id"]
    first_doc = doc_ids_in.filter(pa.array(keep))  # docs starting in-region
    doc_ids = pa.ListArray.from_arrays(
        pa.array(bound_offs, pa.int64()).cast(pa.int32()), first_doc
    ).cast(pa.list_(pa.string()))
    n_docs = pc.cast(pc.list_value_length(doc_ids), pa.int32())
    n_tok = pa.array(np.diff(row_offs).astype(np.int32), pa.int32())

    # deterministic pack id: first contributing doc + row ordinal
    first_idx = np.maximum(bound_offs[:-1] - 1, 0)
    # a row with no doc START inside it continues the previous doc
    has_start = bound_offs[1:] > bound_offs[:-1]
    anchor = np.where(has_start, bound_offs[:-1], first_idx)
    anchor_ids = pc.take(first_doc, pa.array(anchor, pa.int64()))
    pack_id = pc.binary_join_element_wise(
        anchor_ids,
        pa.array([f"p{int(i):06d}" for i in range(n_rows)], pa.string()),
        "#",
    )

    out = pa.table(
        {
            "pack_id": pack_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "n_docs": n_docs,
            "boundaries": boundaries,
            "doc_ids": doc_ids,
        }
    )
    # the source column is ALWAYS present so per-block outputs share
    # one schema: a constant when the batch is single-source (grouped
    # packing), null for mixed batches (never a lie)
    src_val = None
    if "source" in batch.column_names and batch.num_rows:
        mm = pc.min_max(batch["source"])
        if mm["min"].as_py() == mm["max"].as_py():
            src_val = mm["min"].as_py()
    out = out.append_column(
        "source",
        pa.nulls(n_rows, pa.string())
        if src_val is None
        else pa.array([src_val] * n_rows, pa.string()),
    )
    return out


class SequencePacker:
    """map_batches callable form: ``ds.map_batches(SequencePacker(2048),
    batch_format="pyarrow")`` — stateless, so it runs as a task pool."""

    def __init__(self, context_len: int, drop_remainder: bool = True):
        self.context_len = context_len
        self.drop_remainder = drop_remainder

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pack_batch(batch, self.context_len, self.drop_remainder)


def pack_sequences(
    ds,
    context_len: int,
    drop_remainder: bool = True,
    by: str | None = None,
):
    """Pack a Dataset of (doc_id, tokens, ...) rows.

    ``by=None`` (the scale path): pack each streaming block
    independently — no exchange, bounded waste. ``by="source"``: one
    bucket exchange so each group packs contiguously — packed-row
    counts become exactly ``sum(n_tok) // context_len`` per group
    (blocking-independent; what the conformance oracle checks).
    """
    if by is None:
        return ds.map_batches(
            SequencePacker(context_len, drop_remainder), batch_format="pyarrow"
        )

    def pack_group(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        return pack_batch(g.take(order), context_len, drop_remainder)

    return ds.groupby(by).map_groups(pack_group, batch_format="pyarrow")
