"""Duplicated token-window removal (ops/windowdedup.py): kernel unit
tests for ``list_windows`` plus end-to-end table-op checks against an
independently recomputed expectation — the motif layout is chosen so
the cut is closed-form (plant a shared ``L``-token motif at an
``stride``-aligned offset; every planted row except the corpus-first
loses exactly ``[o, o+L)``)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from fupi_ray.functions import textkernels as tk
from fupi_ray.ops import dedup_token_windows
from fupi_ray.table import Table

W, S = 40, 20
L = W + 2 * S  # motif: duplicated windows at rel 0, S, 2S -> merged [o, o+L)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _py_list_windows(toks: list[int], width: int, stride: int) -> list[tuple]:
    if len(toks) < width:
        return []
    return [
        tuple(toks[k * stride : k * stride + width])
        for k in range((len(toks) - width) // stride + 1)
    ]


def test_list_windows_matches_python_reference():
    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 100, int(n)).tolist() for n in rng.integers(0, 90, 30)]
    rows += [[], list(range(39)), list(range(40)), list(range(41))]
    col = pa.array(rows, pa.list_(pa.int32()))
    wins, doc_idx, n_win, ew = tk.list_windows(col, W, S)
    assert ew == 4
    expected = [_py_list_windows(r, W, S) for r in rows]
    assert n_win.tolist() == [len(e) for e in expected]
    flat = [w for e in expected for w in e]
    got = [tuple(np.frombuffer(bytes(r), dtype="<i4")) for r in wins]
    assert got == flat
    assert doc_idx.tolist() == [i for i, e in enumerate(expected) for _ in e]


def test_list_windows_sliced_and_chunked_input():
    rows = [list(range(i, i + 60)) for i in range(8)]
    col = pa.chunked_array(
        [pa.array(rows[:5], pa.list_(pa.int32())).slice(2, 3),
         pa.array(rows[5:], pa.list_(pa.int32()))]
    )
    wins, doc_idx, n_win, _ = tk.list_windows(col, W, S)
    expected = [_py_list_windows(r, W, S) for r in rows[2:5] + rows[5:]]
    assert n_win.tolist() == [len(e) for e in expected]
    got = [tuple(np.frombuffer(bytes(r), dtype="<i4")) for r in wins]
    assert got == [w for e in expected for w in e]


# ---------------------------------------------------------------------------
# table op
# ---------------------------------------------------------------------------


def _build_planted(table_dir: str, n_rows: int = 60, every: int = 7, seed: int = 7):
    """Table with a shared motif planted at offset S*(i%3) in every
    ``every``-th row that is long enough. Returns (table, expected
    token arrays after dedup, planted doc_ids)."""
    rng = np.random.default_rng(seed)
    motif = rng.integers(0, 50000, L, dtype=np.int32)
    rows, exp, planted_ids = [], {}, []
    for i in range(n_rows):
        did = f"doc-{i:012d}"
        n = int(rng.integers(90, 300))
        toks = rng.integers(0, 50000, n, dtype=np.int32)
        o = S * (i % 3)
        planted = i % every == 0 and n >= o + L
        if planted:
            toks[o : o + L] = motif
            planted_ids.append(did)
        rows.append(
            {"doc_id": did, "tokens": toks.tolist(), "n_tok": n, "source": "s"}
        )
        exp[did] = (toks.copy(), o, planted)
    t = Table.create(table_dir)
    ds = ray.data.from_items(rows).map_batches(lambda b: b, batch_format="pyarrow")
    t.commit_append(ds, target_fragment_rows=13)
    first = min(planted_ids) if planted_ids else None
    want = {
        d: (np.delete(tk_, np.s_[o : o + L]) if (p and d != first) else tk_)
        for d, (tk_, o, p) in exp.items()
    }
    return t, want, planted_ids


def _assert_tokens_equal(t: Table, want: dict):
    rows = t.scan().take_all()
    got = {r["doc_id"]: np.asarray(r["tokens"], np.int32) for r in rows}
    assert set(got) == set(want)
    for d in want:
        assert np.array_equal(got[d], want[d]), d
    assert {r["doc_id"]: r["n_tok"] for r in rows} == {
        d: len(v) for d, v in want.items()
    }


def test_dedup_token_windows_cow(tmp_table_dir):
    t, want, planted = _build_planted(tmp_table_dir)
    m = dedup_token_windows(t, width=W, stride=S)
    assert m["rows_rewritten"] == len(planted) - 1
    assert m["tokens_removed"] == (len(planted) - 1) * L
    assert m["spans_cut"] == len(planted) - 1
    assert m["version"] == t.latest_version()
    _assert_tokens_equal(t, want)
    # corpus-first survivor kept its motif verbatim
    # second run: the survivor's motif is now unique -> strict no-op
    m2 = dedup_token_windows(t, width=W, stride=S)
    assert m2["rows_rewritten"] == 0 and m2["version"] == m["version"]


def test_dedup_token_windows_dv_mode(tmp_table_dir):
    t, want, planted = _build_planted(tmp_table_dir)
    m = dedup_token_windows(t, width=W, stride=S, mode="dv")
    assert m["rows_rewritten"] == len(planted) - 1
    _assert_tokens_equal(t, want)


def test_min_dups_threshold(tmp_table_dir):
    # motif in exactly 2 rows: min_dups=3 must be a no-op
    t, want, planted = _build_planted(tmp_table_dir, n_rows=15, every=8)
    assert len(planted) == 2
    base = t.latest_version()
    m = dedup_token_windows(t, width=W, stride=S, min_dups=3)
    assert m["rows_rewritten"] == 0 and m["version"] == base
    m2 = dedup_token_windows(t, width=W, stride=S, min_dups=2)
    assert m2["rows_rewritten"] == 1
    _assert_tokens_equal(t, want)


def test_fully_cut_row_kept_empty(tmp_table_dir):
    rng = np.random.default_rng(3)
    motif = rng.integers(0, 50000, L, dtype=np.int32)
    rows = [
        # corpus-first holder of the motif (lowest doc_id)
        {"doc_id": "doc-a", "tokens": motif.tolist() + rng.integers(0, 50000, 50, dtype=np.int32).tolist(), "n_tok": L + 50, "source": "s"},
        # row that IS the motif exactly: every window duplicated -> all cut
        {"doc_id": "doc-b", "tokens": motif.tolist(), "n_tok": L, "source": "s"},
    ]
    t = Table.create(tmp_table_dir)
    t.commit_append(
        ray.data.from_items(rows).map_batches(lambda b: b, batch_format="pyarrow"),
        target_fragment_rows=1,
    )
    m = dedup_token_windows(t, width=W, stride=S)
    assert m["rows_rewritten"] == 1 and m["tokens_removed"] == L
    got = {r["doc_id"]: r for r in t.scan().take_all()}
    assert got["doc-b"]["tokens"] == [] and got["doc-b"]["n_tok"] == 0
    assert np.array_equal(np.asarray(got["doc-a"]["tokens"][:L]), motif)


def test_no_duplicates_no_commit(tmp_table_dir):
    t, _, _ = _build_planted(tmp_table_dir, n_rows=10, every=99)
    base = t.latest_version()
    m = dedup_token_windows(t, width=W, stride=S)
    assert m == {
        "version": base,
        "rows_rewritten": 0,
        "tokens_removed": 0,
        "spans_cut": 0,
    }


def test_param_validation(tmp_table_dir):
    t = Table.create(tmp_table_dir)
    with pytest.raises(ValueError):
        dedup_token_windows(t, width=0)
    with pytest.raises(ValueError):
        dedup_token_windows(t, width=10, stride=0)


def test_dense_fallback_matches_sparse_path(tmp_table_dir):
    # the two detect shapes (hash-candidate broadcast vs ship-everything)
    # must produce identical span sets; max_broadcast=0 forces the dense
    # branch on the same planted table
    from fupi_ray.ops.windowdedup import _detect_spans

    t, _, _ = _build_planted(tmp_table_dir)

    def spans_with(max_broadcast):
        ds = _detect_spans(
            lambda: t.scan(columns=["doc_id", "tokens"]),
            W,
            S,
            2,
            64,
            max_broadcast=max_broadcast,
        )
        return sorted(
            (r["doc_id"], bytes(r["starts"])) for r in ds.take_all()
        )

    sparse = spans_with(10**9)
    dense = spans_with(0)
    assert sparse == dense and len(sparse) > 0


def test_phase_a_short_circuit_skips_second_scan(tmp_table_dir):
    # a duplicate-free table must come back None straight from the hash
    # exchange (no instance extraction, no span assembly)
    from fupi_ray.ops.windowdedup import _detect_spans

    t, _, _ = _build_planted(tmp_table_dir, n_rows=10, every=99)
    got = _detect_spans(
        lambda: t.scan(columns=["doc_id", "tokens"]), W, S, 2, 64
    )
    assert got is None
