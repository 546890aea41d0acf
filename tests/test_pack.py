"""Sequence packing: token-stream preservation, boundary/doc_id
bookkeeping, remainder modes, grouped (blocking-independent) counts,
and the per-block scale path over a Dataset."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from fupi_ray.fixtures import generate_rows
from fupi_ray.stages.pack import pack_batch, pack_sequences

L = 256


def test_pack_preserves_token_stream_and_boundaries():
    b = generate_rows(0, 120)
    vals = np.asarray(b["tokens"].combine_chunks().values)
    offs = np.asarray(b["tokens"].combine_chunks().offsets)
    out = pack_batch(b, L)
    n_full = len(vals) // L
    assert out.num_rows == n_full
    flat = np.concatenate([np.asarray(x) for x in out["tokens"].to_pylist()])
    assert np.array_equal(flat, vals[: n_full * L])
    assert set(out["n_tok"].to_pylist()) == {L}
    # every boundary points at the first token of its doc
    first = {b["doc_id"][i].as_py(): vals[offs[i]] for i in range(120)}
    for r in out.to_pylist():
        assert len(r["boundaries"]) == r["n_docs"] == len(r["doc_ids"])
        for pos, did in zip(r["boundaries"], r["doc_ids"]):
            assert r["tokens"][pos] == first[did]


def test_pack_keep_remainder():
    b = generate_rows(0, 50)
    vals = np.asarray(b["tokens"].combine_chunks().values)
    out = pack_batch(b, L, drop_remainder=False)
    flat = np.concatenate([np.asarray(x) for x in out["tokens"].to_pylist()])
    assert np.array_equal(flat, vals)  # nothing dropped
    assert out.num_rows == -(-len(vals) // L)
    lens = out["n_tok"].to_pylist()
    assert all(n == L for n in lens[:-1]) and 0 < lens[-1] <= L


def test_pack_empty_batch():
    b = generate_rows(0, 1).slice(0, 0)
    out = pack_batch(b, L)
    assert out.num_rows == 0
    assert "tokens" in out.column_names


def test_grouped_pack_counts_blocking_independent():
    b = generate_rows(0, 400)
    want = {}
    df = b.to_pandas()
    for src, g in df.groupby("source"):
        want[src] = int(g["n_tok"].sum()) // L
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(b).repartition(nblocks)
        packed = pack_sequences(ds, L, by="source")
        got = packed.to_pandas().groupby("source").size().to_dict()
        assert got == {k: v for k, v in want.items() if v > 0}


def test_per_block_pack_streams_without_exchange():
    b = generate_rows(0, 300)
    ds = ray.data.from_arrow(b).repartition(4)
    packed = pack_sequences(ds, L)  # by=None: per-block, no groupby
    rows = packed.take_all()
    # per-block waste bound: each of the 4 blocks drops < L tokens
    total_in = int(b["n_tok"].combine_chunks().to_pandas().sum())
    total_out = sum(r["n_tok"] for r in rows)
    assert total_in - total_out < 4 * L
    assert all(r["n_tok"] == L for r in rows)
    # source carried when a block is single-source only; never wrong
    for r in rows:
        if "source" in r and r["source"] is not None:
            pass  # constancy is checked inside pack_batch via min==max
