"""Randomized op-sequence property test for the versioned TIMELINE
semantics (the bucket twin, test_property_bucket.py, checks layout
invariants; this one checks history): whatever seeded sequence of
append / DV- and COW-delete / update / merge / insert_missing /
compact / cluster / WAP publish-or-abort / rollback / expire runs
against a table,

1. the live scan always equals an in-memory pandas model,
2. time travel to ANY surviving version equals the model snapshot
   taken when that version committed,
3. the netted changelog between two surviving versions replays one
   snapshot into the other (delete-set out, insert-set in — exactly),
4. a WAP stage is invisible until publish, ``staged_scan`` previews
   exactly model ∪ staged, and an aborted stage changes nothing,
5. ``check_table`` (fsck) finds nothing to report at every step.
"""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import generate_rows, sequences_dataset
from fupi_ray.ops import (
    abort_stage,
    changelog,
    cluster,
    compact,
    delete_where,
    expire_snapshots,
    insert_missing,
    merge_into,
    publish_stage,
    rollback,
    stage_append,
    update_where,
)
from fupi_ray.ops.fsck import check_table
from fupi_ray.ops.stage import staged_scan
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=128 * 1024, expire_keep_last=4)
COLS = ["doc_id", "tokens", "n_tok", "source"]


def model_df(n, start=0, token_salt=0):
    df = generate_rows(start, n, token_salt=token_salt).to_pandas()
    df["tokens"] = df["tokens"].map(tuple)
    return df


def scan_to_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["tokens"] = df["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    return df.sort_values("doc_id").reset_index(drop=True)[COLS]


def assert_state(t: Table, model: pd.DataFrame, version=None):
    got = scan_to_df(t.scan(version))
    want = model.sort_values("doc_id").reset_index(drop=True)[COLS]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def row_keys(df: pd.DataFrame) -> set:
    return set(map(tuple, df[COLS].itertuples(index=False, name=None)))


@pytest.mark.parametrize("seed", [11, 42])
def test_random_timeline_preserves_history_semantics(tmp_path, seed):
    rng = random.Random(seed)
    t = Table.create(str(tmp_path / f"t{seed}"), config=CFG)
    t.commit_append(sequences_dataset(500, rows_per_partition=125))
    model = model_df(500)
    snapshots = {t.latest_version(): model.copy()}
    next_id = 10_000

    def record():
        snapshots[t.latest_version()] = model.copy()

    for step in range(12):
        op = rng.choice(
            [
                "append", "dv_delete", "cow_delete", "update", "merge",
                "insert_missing", "compact", "cluster", "wap_publish",
                "wap_abort", "rollback", "expire", "ingest",
            ]
        )
        if op == "append":
            n = rng.randrange(40, 120)
            t.commit_append(sequences_dataset(n, start=next_id, rows_per_partition=40))
            model = pd.concat([model, model_df(n, start=next_id)], ignore_index=True)
            next_id += n
        elif op in ("dv_delete", "cow_delete"):
            lo = rng.randrange(8, 400)
            hi = lo + rng.randrange(20, 120)
            delete_where(
                t,
                [("n_tok", "between", (lo, hi))],
                mode="dv" if op == "dv_delete" else "cow",
            )
            model = model[~model.n_tok.between(lo, hi)]
        elif op == "update":
            cut = rng.randrange(100, 500)
            tag = f"curated-{step}"
            update_where(t, [("n_tok", ">", cut)], {"source": tag})
            model.loc[model.n_tok > cut, "source"] = tag
        elif op == "merge":
            n = rng.randrange(20, 60)
            # overlap half the keys with live rows: upsert must replace
            start = next_id - n // 2 if next_id > 10_000 else next_id
            src = sequences_dataset(
                n, start=start, rows_per_partition=40, token_salt=5
            ).map_batches(
                lambda b: b.append_column(
                    "_src_order", pa.array(np.arange(b.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
            merge_into(t, src)
            salted = model_df(n, start=start, token_salt=5)
            model = pd.concat(
                [model[~model.doc_id.isin(salted.doc_id)], salted], ignore_index=True
            )
            next_id = max(next_id, start + n)
        elif op == "insert_missing":
            n = rng.randrange(20, 60)
            start = next_id - n // 2 if next_id > 10_000 else next_id
            # changed payload on re-offered keys must be IGNORED
            src = sequences_dataset(n, start=start, rows_per_partition=40, token_salt=9)
            insert_missing(t, src)
            offered = model_df(n, start=start, token_salt=9)
            fresh = offered[~offered.doc_id.isin(model.doc_id)]
            model = pd.concat([model, fresh], ignore_index=True)
            next_id = max(next_id, start + n)
        elif op == "compact":
            compact(t)
        elif op == "cluster":
            cluster(t, curve=rng.choice(["zorder", "hilbert"]))
        elif op in ("wap_publish", "wap_abort"):
            n = rng.randrange(20, 50)
            before = model.copy()
            sid = stage_append(t, sequences_dataset(n, start=next_id, rows_per_partition=40))
            assert_state(t, before)  # staged rows invisible pre-publish
            preview = pd.concat(
                [before, model_df(n, start=next_id)], ignore_index=True
            )
            got = scan_to_df(staged_scan(t, sid))
            pd.testing.assert_frame_equal(
                got,
                preview.sort_values("doc_id").reset_index(drop=True)[COLS],
                check_dtype=False,
            )
            if op == "wap_publish":
                publish_stage(t, sid)
                model = preview
                next_id += n
            else:
                abort_stage(t, sid)
        elif op == "rollback":
            candidates = [v for v in t.versions() if v in snapshots]
            v = rng.choice(candidates)
            try:
                rollback(t, v)
            except ValueError:
                continue  # target's fragments already GC'd: refusal is the contract
            model = snapshots[v].copy()
        elif op == "expire":
            expire_snapshots(t, keep_last=4, gc_grace_seconds=0)
        elif op == "ingest":
            # file-level COPY INTO: a fresh landing file loads; the
            # same file re-offered in the same step is a no-op
            import pyarrow.parquet as pq

            from fupi_ray.ops import ingest_files

            n = rng.randrange(20, 50)
            f = str(tmp_path / f"landing-{seed}-{step}.parquet")
            pq.write_table(generate_rows(next_id, n), f)
            r = ingest_files(t, [f])
            assert r["files_ingested"] == 1, r
            assert ingest_files(t, [f])["files_ingested"] == 0
            model = pd.concat([model, model_df(n, start=next_id)], ignore_index=True)
            next_id += n

        record()
        assert_state(t, model)

        # time travel: any surviving recorded version reads its snapshot
        survivors = [v for v in t.versions() if v in snapshots]
        v = rng.choice(survivors)
        assert_state(t, snapshots[v], version=v)

        # changelog replay between two surviving snapshots
        if len(survivors) >= 2:
            v1, v2 = sorted(rng.sample(survivors, 2))
            delta = scan_to_df_changelog(changelog(t, v1, v2))
            base, target = row_keys(snapshots[v1]), row_keys(snapshots[v2])
            dels = row_keys(delta[delta.change_type == "delete"])
            ins = row_keys(delta[delta.change_type == "insert"])
            assert dels <= base, "changelog deletes a row v1 never had"
            assert (base - dels) | ins == target
            assert not (ins & (base - dels)), "insert of a row already present"

        audit = check_table(t)
        assert audit["ok"], audit["findings"]

    # capstone: the needle index over whatever layout the sequence left
    # behind — an out-of-vocab token must come back empty through the
    # bloom probes and the DV-masked exact verify
    from fupi_ray.ops import keyword_lookup

    assert keyword_lookup(t, [2_000_000_001], columns=["doc_id"]).take_all() == []


def scan_to_df_changelog(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    if df.empty:  # content-identical versions: no delta rows, no schema
        return pd.DataFrame(columns=COLS + ["change_type"])
    df["tokens"] = df["tokens"].map(
        lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
    )
    return df
