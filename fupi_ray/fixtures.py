"""Deterministic synthetic `sequences` tables (FIXTURES.md F1/F2).

Generation is purely functional in the row index: every value derives
from splitmix64 mixes of ``(seed, row_id, stream)`` — no global RNG
state, no wall clock — so any partitioning of the id range produces the
same rows (resume determinism, FIXTURES.md "seed-per-partition
hashing"). Fully vectorized (numpy) and parallelized as a Ray Data
pipeline: a tiny partition-spec dataset → ``map_batches`` generator.

Schema (BASELINE.json input_hint):
  doc_id:string  "doc-{i:012d}"
  tokens:list<int32>  uniform [0, 50257), length n_tok
  n_tok:int32    8 + lognormal(mu=4, sigma=1), clamped [8, 8192]
  source:string  zipf-skewed over {cc, wiki, code, books, forums}
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

VOCAB = 50257
SOURCES = ("cc", "wiki", "code", "books", "forums")
# zipf-ish weights 1/k^1.1, normalized → hot-key skew on "cc"
_W = np.array([1.0 / (k + 1) ** 1.1 for k in range(len(SOURCES))])
_CUM = np.cumsum(_W / _W.sum())

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # uint64 wrap-around is intentional; without errstate numpy 1.26
    # routes every overflowing element through the warning machinery
    # (~200x slower than the raw SIMD multiply)
    with np.errstate(over="ignore"):
        x = (x + _C1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _C2).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _C3).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 → float64 uniform in (0, 1)."""
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) + 1e-300


def _row_stream(seed: int, ids: np.ndarray, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        base = np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(stream) * np.uint64(
            0xDEADBEEF97
        )
        return _splitmix64(ids.astype(np.uint64) ^ base)


def gen_n_tok(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    u1 = _u01(_row_stream(seed, ids, 1))
    u2 = _u01(_row_stream(seed, ids, 2))
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)  # Box–Muller
    n = 8 + np.exp(4.0 + 1.0 * z).astype(np.int64)
    return np.clip(n, 8, 8192).astype(np.int32)


def gen_source(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    u = _u01(_row_stream(seed, ids, 3))
    idx = np.searchsorted(_CUM, u)
    return np.asarray(SOURCES, dtype=object)[np.clip(idx, 0, len(SOURCES) - 1)]


def gen_tokens_flat(ids: np.ndarray, n_tok: np.ndarray, seed: int = 42, salt: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Token values for all rows, flattened, plus list offsets.

    token[i][j] = splitmix64(mix(seed, id_i, j)) % VOCAB — per-row
    deterministic regardless of batch boundaries. ``salt`` lets MERGE
    fixtures regenerate different tokens for the same doc_id.
    """
    n = n_tok.astype(np.int64)
    offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n, out=offsets[1:])
    total = int(offsets[-1])
    flat_row = np.repeat(ids.astype(np.uint64), n)
    # intra-row position j = global position - row start
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n)
    with np.errstate(over="ignore"):
        mixed = _splitmix64(
            (flat_row * np.uint64(0x9E3779B1))
            ^ (j.astype(np.uint64) * np.uint64(0x85EBCA77))
            ^ np.uint64((seed * 2654435761 + salt * 0x9747B28C) & 0xFFFFFFFFFFFFFFFF)
        )
    vals = (mixed % np.uint64(VOCAB)).astype(np.int32)
    return vals, offsets


def doc_ids(ids: np.ndarray) -> pa.Array:
    # vectorized 'doc-' || lpad(id, 12, '0') — Arrow kernels end to
    # end; this renders on every generated ingest batch
    import pyarrow.compute as pc

    digits = pc.utf8_lpad(
        pc.cast(pa.array(np.asarray(ids, dtype=np.int64)), pa.string()),
        width=12,
        padding="0",
    )
    return pc.binary_join_element_wise("doc-", digits, "")


def generate_rows(start: int, count: int, seed: int = 42, token_salt: int = 0) -> pa.Table:
    """One partition of the sequences table, as Arrow."""
    ids = np.arange(start, start + count, dtype=np.int64)
    n_tok = gen_n_tok(ids, seed)
    source = gen_source(ids, seed)
    vals, offsets = gen_tokens_flat(ids, n_tok, seed, token_salt)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32() if offsets[-1] < 2**31 else pa.int64()), pa.array(vals, type=pa.int32()))
    if tokens.type != pa.list_(pa.int32()):
        tokens = tokens.cast(pa.list_(pa.int32()))
    return pa.table(
        {
            "doc_id": doc_ids(ids),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(source.astype(str), type=pa.string()),
        }
    )


def sequences_dataset(
    num_rows: int,
    seed: int = 42,
    rows_per_partition: int = 50_000,
    start: int = 0,
    token_salt: int = 0,
) -> ray.data.Dataset:
    """Lazy distributed generator: partition specs → map_batches.

    The spec dataset is tiny (one row per partition); generation fans
    out across the cluster and streams — nothing materializes on the
    driver.
    """
    specs = []
    s = start
    end = start + num_rows
    while s < end:
        c = min(rows_per_partition, end - s)
        specs.append({"start": s, "count": c})
        s += c

    def gen(batch: pa.Table) -> pa.Table:
        parts = [
            generate_rows(int(st), int(ct), seed, token_salt)
            for st, ct in zip(batch["start"].to_pylist(), batch["count"].to_pylist())
        ]
        return pa.concat_tables(parts)

    # one block per spec (override_num_blocks, not a repartition() —
    # that would be a needless all-to-all barrier in every caller's DAG)
    return ray.data.from_items(specs, override_num_blocks=len(specs)).map_batches(
        gen, batch_format="pyarrow"
    )


def merge_source_dataset(
    base_rows: int,
    seed: int = 42,
    update_frac: float = 0.4,
    insert_frac: float = 0.4,
    dup_frac: float = 0.1,
    rows_per_partition: int = 50_000,
) -> ray.data.Dataset:
    """MERGE right-hand side per FIXTURES.md F2: updates (existing ids,
    new tokens via salt=1), inserts (fresh ids past the base range) and
    intra-source duplicate doc_ids (first occurrence wins).

    Adds ``_src_order:int64`` — explicit source ordering that makes
    keep-first dedup well-defined under distribution (SURVEY.md §2.5
    A2: the reference's drop_duplicates keep='first' relies on driver
    row order; a distributed engine needs the order to be a column).
    """
    n_upd = int(base_rows * update_frac)
    n_ins = int(base_rows * insert_frac)
    n_dup = int(base_rows * dup_frac)

    def build(kind: str, start: int, count: int, salt: int, order_base: int):
        def gen(batch: pa.Table) -> pa.Table:
            outs = []
            for st, ct, ob in zip(
                batch["start"].to_pylist(), batch["count"].to_pylist(), batch["order"].to_pylist()
            ):
                t = generate_rows(int(st), int(ct), seed, token_salt=salt)
                t = t.append_column("_src_order", pa.array(np.arange(ob, ob + ct, dtype=np.int64)))
                outs.append(t)
            return pa.concat_tables(outs)

        specs = []
        s, done = start, 0
        while done < count:
            c = min(rows_per_partition, count - done)
            specs.append({"start": s, "count": c, "order": order_base + done})
            s += c
            done += c
        if not specs:
            return None
        return ray.data.from_items(specs, override_num_blocks=len(specs)).map_batches(
            gen, batch_format="pyarrow"
        )

    # updates: every 2nd id in [0, 2*n_upd) → existing keys, salted tokens
    upd = sequences_dataset(n_upd * 2, seed, rows_per_partition, start=0, token_salt=1)
    import pyarrow.compute as pc

    def every_other(t: pa.Table, order_base: int = 0) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64())
        keep = pc.equal(pc.bit_wise_and(idx, 1), 0)
        t = t.filter(keep)
        order = pc.add(pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64()), order_base)
        return t.append_column("_src_order", pc.cast(order, pa.int64()))

    upd = upd.map_batches(every_other, batch_format="pyarrow")
    parts = [upd]
    ins = build("ins", base_rows + 10_000_000, n_ins, 0, order_base=10_000_000_000)
    if ins is not None:
        parts.append(ins)
    # duplicates: same keys as the first n_dup updates but salt=2 and LATER order → must lose
    dup = sequences_dataset(n_dup * 2, seed, rows_per_partition, start=0, token_salt=2)
    dup = dup.map_batches(lambda t: every_other(t, order_base=20_000_000_000), batch_format="pyarrow")
    parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def write_fragmented_table(
    table_dir: str,
    num_rows: int,
    seed: int = 42,
    rows_per_fragment: int = 2_000,
    config=None,
):
    """Build a sequences Table in the deliberately small-file state that
    makes the reference call compact_files() after every ingest
    (fupi/embedders.py:124-128): one fragment per small partition."""
    from fupi_ray.table import Table

    t = Table.create(table_dir, config=config)
    ds = sequences_dataset(num_rows, seed, rows_per_partition=rows_per_fragment)
    t.commit_append(ds)
    return t
