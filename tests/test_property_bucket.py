"""Randomized op-sequence property test for the bucket layout
invariants: whatever seeded sequence of append / DV-delete / COW-delete
/ update / compact / merge / rebucket / maintain runs against a table,

1. the scan always equals an in-memory pandas model of the same ops,
2. whenever every live fragment is tagged, every fragment is
   bucket-pure under its own signature (tag == hash(key) % N),
3. bucket_join against a bucketed copy of the model either refuses
   with BucketLayoutError (layout broken mid-sequence) or returns
   exactly the model join.
"""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset
from fupi_ray.functions.hashing import stable_hash
from fupi_ray.ops import (
    BucketLayoutError,
    bucket_join,
    bucket_table,
    compact,
    delete_where,
    maintain,
    merge_into,
    update_where,
)
from fupi_ray.ops.bucket import fragment_layout
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=128 * 1024, expire_keep_last=3)


def model_df(n, start=0):
    from fupi_ray.fixtures import generate_rows

    df = generate_rows(start, n).to_pandas()
    df["tokens"] = df["tokens"].map(tuple)
    return df


def scan_df(t):
    df = t.scan().to_pandas()
    df["tokens"] = df["tokens"].map(lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a))
    return df.sort_values("doc_id").reset_index(drop=True)


def assert_purity(t):
    m = t.manifest()
    lay = fragment_layout(m)
    if lay is None:
        return
    n = np.uint64(lay["num_buckets"])
    for f in m.fragments:
        tbl = pq.read_table(f"{t.table_dir}/{f.path}", columns=["doc_id"])
        if tbl.num_rows:
            h = stable_hash(tbl["doc_id"]) % n
            assert (h == np.uint64(f.bucket)).all(), f"impure {f.path}"


@pytest.mark.parametrize("seed", [7, 23])
def test_random_op_sequence_preserves_invariants(tmp_path, seed):
    rng = random.Random(seed)
    t = Table.create(str(tmp_path / f"t{seed}"), config=CFG)
    t.commit_append(sequences_dataset(600, rows_per_partition=150))
    model = model_df(600)
    next_id = 10_000

    bucket_table(t, key="doc_id", num_buckets=4)

    for step in range(10):
        op = rng.choice(
            ["append", "dv_delete", "cow_delete", "update", "compact", "merge", "maintain"]
        )
        if op == "append":
            n = rng.randrange(50, 150)
            t.commit_append(sequences_dataset(n, start=next_id, rows_per_partition=50))
            model = pd.concat([model, model_df(n, start=next_id)], ignore_index=True)
            next_id += n
        elif op in ("dv_delete", "cow_delete"):
            lo = rng.randrange(8, 400)
            hi = lo + rng.randrange(20, 120)
            mode = "dv" if op == "dv_delete" else "cow"
            delete_where(t, [("n_tok", "between", (lo, hi))], mode=mode)
            model = model[~model.n_tok.between(lo, hi)]
        elif op == "update":
            cut = rng.randrange(100, 500)
            update_where(t, [("n_tok", ">", cut)], {"source": "curated"})
            model.loc[model.n_tok > cut, "source"] = "curated"
        elif op == "compact":
            compact(t)
        elif op == "merge":
            n = rng.randrange(30, 80)
            src = sequences_dataset(
                n, start=next_id, rows_per_partition=50, token_salt=3
            ).map_batches(
                lambda b: b.append_column(
                    "_src_order", pa.array(np.arange(b.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
            merge_into(t, src)
            from fupi_ray.fixtures import generate_rows

            salted = generate_rows(next_id, n, token_salt=3).to_pandas()
            salted["tokens"] = salted["tokens"].map(tuple)
            model = pd.concat([model, salted], ignore_index=True)
            next_id += n
        elif op == "maintain":
            maintain(t, keep_last=3)

        got = scan_df(t)
        want = model.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert_purity(t)

    # capstone: bucket_join against a bucketed projection of the model
    maintain(t, keep_last=3)  # repairs the layout if an append broke it
    right = Table.create(
        str(tmp_path / f"r{seed}"),
        schema=pa.schema([("doc_id", pa.string()), ("mark", pa.int64())]),
        config=CFG,
    )
    rdf = model[model.n_tok > 200][["doc_id"]].copy()
    rdf["mark"] = 1
    right.commit_append(ray.data.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False)))
    lay = fragment_layout(t.manifest())
    assert lay is not None, "maintain must leave a valid layout"
    bucket_table(right, key="doc_id", num_buckets=lay["num_buckets"])
    try:
        got = bucket_join(
            t, right, on="doc_id",
            columns_left=["doc_id", "n_tok"], columns_right=["doc_id", "mark"],
        ).to_pandas()
    except BucketLayoutError:
        pytest.fail("layout was just repaired; join must not refuse")
    want = model[model.n_tok > 200]
    assert len(got) == len(want)
    assert (got["n_tok"] > 200).all()
