"""Quantile column statistics (ops/analyze.py DDSketch sidecars) and
metadata-only aggregates (Table.count_rows / Table.column_range):
guaranteed-relative-error estimates, incremental ensure, layout
invariance, GC with the owning fragment, exactness flags under
deletion vectors."""

import os

import numpy as np
import pytest

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import sequences_dataset, write_fragmented_table
from fupi_ray.ops import (
    column_quantiles,
    compact,
    delete_where,
    ensure_quantile_sketches,
    expire_snapshots,
)
from fupi_ray.ops.analyze import qsk_path
from fupi_ray.state import fs as _fs

CFG = EngineConfig(target_fragment_bytes=256 * 1024, expire_keep_last=1)


def _exact_n_tok(t):
    return np.array(
        [r["n_tok"] for r in t.scan(columns=["n_tok"]).take_all()], dtype=np.float64
    )


def test_quantile_estimates_within_relative_error(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    res = ensure_quantile_sketches(t, columns=("n_tok",))
    nfrags = len(t.manifest().fragments)
    assert res == {"built": nfrags, "cached": 0}
    # second ensure: all cached
    assert ensure_quantile_sketches(t, columns=("n_tok",)) == {
        "built": 0,
        "cached": nfrags,
    }
    stats: dict = {}
    out = column_quantiles(
        t, columns=("n_tok",), qs=(0.0, 0.5, 0.95, 1.0), stats_out=stats
    )["n_tok"]
    assert stats["fragments_missing"] == 0
    x = _exact_n_tok(t)
    # exact side stats ride along for free
    assert out["count"] == len(x)
    assert out["min"] == x.min() and out["max"] == x.max()
    assert abs(out["sum"] - x.sum()) < 1e-6
    # q0/q1 are exact (clamped to vmin/vmax); interior quantiles are
    # within the DDSketch guarantee (gamma-1)/(gamma+1) ≈ 1%
    assert out["q0"] == x.min() and out["q1"] == x.max()
    for q in (0.5, 0.95):
        true = float(np.quantile(x, q))
        assert abs(out[f"q{q:g}"] - true) / max(abs(true), 1e-12) < 0.011

    # append: only the new fragments pay a build
    t.commit_append(sequences_dataset(500, start=90_000, rows_per_partition=250))
    res = ensure_quantile_sketches(t, columns=("n_tok",))
    assert res["built"] == len(t.manifest().fragments) - nfrags


def test_quantiles_are_layout_invariant(tmp_table_dir):
    """The same rows partitioned differently merge to the IDENTICAL
    estimate: bucket-count sum is associative and layout-independent."""
    t = write_fragmented_table(tmp_table_dir, 1_500, rows_per_fragment=150, config=CFG)
    before = column_quantiles(t, columns=("n_tok",), qs=(0.25, 0.5, 0.9))
    compact(t)
    after = column_quantiles(t, columns=("n_tok",), qs=(0.25, 0.5, 0.9))
    assert before == after


def test_non_numeric_refused_and_lower_bound(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 400, rows_per_fragment=200, config=CFG)
    with pytest.raises(ValueError, match="numeric"):
        ensure_quantile_sketches(t, columns=("doc_id",))
    with pytest.raises(ValueError, match="unknown column"):
        ensure_quantile_sketches(t, columns=("nope",))
    # build=False with un-sketched fragments: honest missing count
    ensure_quantile_sketches(t, columns=("n_tok",))
    t.commit_append(sequences_dataset(200, start=70_000, rows_per_partition=100))
    stats: dict = {}
    column_quantiles(t, columns=("n_tok",), build=False, stats_out=stats)
    assert stats["fragments_missing"] > 0


def test_qsk_sidecars_gc_with_their_fragments(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 600, rows_per_fragment=100, config=CFG)
    ensure_quantile_sketches(t, columns=("n_tok",))
    old_paths = [f.path for f in t.manifest().fragments]
    compact(t)
    res = expire_snapshots(t, keep_last=1, gc_grace_seconds=0.0)
    assert res["gc_files"] > 0
    for rel in old_paths:
        assert not _fs.exists(qsk_path(os.path.join(t.table_dir, rel)))
    # surviving fragments rebuild fine
    out = column_quantiles(t, columns=("n_tok",))["n_tok"]
    assert out["count"] == 600


def test_count_rows_and_column_range_metadata_only(tmp_table_dir):
    t = write_fragmented_table(tmp_table_dir, 1_000, rows_per_fragment=200, config=CFG)
    x = _exact_n_tok(t)
    assert t.count_rows() == 1_000
    r = t.column_range("n_tok")
    assert r["exact"] is True
    assert r["min"] == x.min() and r["max"] == x.max()
    with pytest.raises(ValueError, match="unknown column"):
        t.column_range("nope")

    # COW delete: rewritten fragments get fresh zone maps → still exact
    delete_where(t, [("n_tok", "==", int(x.min()))], mode="cow")
    x2 = _exact_n_tok(t)
    assert t.count_rows() == len(x2)
    r2 = t.column_range("n_tok")
    assert r2["exact"] is True
    assert r2["min"] == x2.min() and r2["max"] == x2.max()

    # DV delete: count stays exact; the range degrades to a sound
    # OUTER bound and says so
    delete_where(t, [("n_tok", "==", int(x2.min()))], mode="dv")
    x3 = _exact_n_tok(t)
    assert t.count_rows() == len(x3)
    r3 = t.column_range("n_tok")
    assert r3["exact"] is False
    assert r3["min"] <= x3.min() and r3["max"] >= x3.max()

    # snapshot-pinned: the pre-delete version still answers exactly
    assert t.count_rows(version=1) == 1_000


def test_maintain_quantile_arm(tmp_path):
    from fupi_ray.ops import maintain

    t = write_fragmented_table(str(tmp_path / "t"), 600, rows_per_fragment=150, config=CFG)
    out = maintain(t, keep_last=10, quantile_columns=("n_tok",))
    assert out["quantiles"]["built"] > 0
    # untouched table → all cached
    out2 = maintain(t, keep_last=10, quantile_columns=("n_tok",))
    assert out2["quantiles"]["built"] == 0 and out2["quantiles"]["cached"] > 0


def test_estimate_rows_from_sketches_and_zonemaps(tmp_table_dir):
    from fupi_ray.ops import estimate_rows

    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    x = _exact_n_tok(t)
    true = int(((x >= 50) & (x <= 200)).sum())

    # un-analyzed table: zone-map tier — sound upper bound, says so
    e0 = estimate_rows(t, [("n_tok", "between", (50, 200))])
    assert e0["method"] == "zonemap"
    assert e0["estimated"] >= 0 and e0["upper_bound"] >= true

    # sketched table: ddsketch tier — within a few % of the truth
    ensure_quantile_sketches(t, columns=("n_tok",))
    e1 = estimate_rows(t, [("n_tok", "between", (50, 200))])
    assert e1["method"] == "ddsketch"
    assert abs(e1["estimated"] - true) / true < 0.05, (e1, true)
    assert e1["upper_bound"] >= true
    # empty predicate: everything
    assert estimate_rows(t, [])["estimated"] == 2_000


def test_auto_mutation_mode_dispatch(tmp_table_dir):
    from fupi_ray.ops import update_where

    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    ensure_quantile_sketches(t, columns=("n_tok",))
    x = _exact_n_tok(t)
    hi = int(np.quantile(x, 0.99))
    lo = int(np.quantile(x, 0.40))
    paths0 = {f.path for f in t.manifest().fragments}

    # narrow delete (~1% of rows): auto takes the DV path — no parquet
    # rewritten, the mask carries the delete
    delete_where(t, [("n_tok", ">", hi)], mode="auto")
    m1 = t.manifest()
    assert {f.path for f in m1.fragments} == paths0
    assert sum(f.dv_rows for f in m1.fragments) > 0
    assert t.count_rows() == int((x <= hi).sum())

    # wide update (~60% of rows): auto takes the COW path — fragments
    # rewritten, no NEW deletion-vector debt accumulates
    dv_before = sum(f.dv_rows for f in m1.fragments)
    update_where(t, [("n_tok", ">", lo)], {"source": "trimmed"}, mode="auto")
    m2 = t.manifest()
    assert {f.path for f in m2.fragments} != paths0
    assert sum(f.dv_rows for f in m2.fragments) <= dv_before
    n_trimmed = sum(
        1 for r in t.scan(columns=["source"]).take_all() if r["source"] == "trimmed"
    )
    assert n_trimmed == int(((x > lo) & (x <= hi)).sum())


# -- property tests for the sketch kernels (pure numpy, no Ray) -----------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from fupi_ray.functions.sketches import (
    QSK_GAMMA,
    qsk_merge,
    qsk_partial,
    qsk_quantiles,
)

_vals = hnp.arrays(
    np.float64,
    st.integers(1, 400),
    elements=st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
)


@settings(max_examples=60, deadline=None)
@given(_vals, st.integers(1, 7))
def test_qsk_property_error_bound_and_merge_invariance(x, nsplit):
    """For ANY finite values (negatives, zeros, denormal-ish tails):
    (1) splitting the input into blocks and merging gives the same
    state as one pass; (2) every quantile is within the DDSketch
    relative-error guarantee of the true order statistic."""
    one = qsk_partial(x)
    parts = [qsk_partial(c) for c in np.array_split(x, nsplit)]
    acc = parts[0]
    for p in parts[1:]:
        acc = qsk_merge(acc, p)
    assert np.array_equal(acc["keys"], one["keys"])
    assert np.array_equal(acc["counts"], one["counts"])
    assert acc["zero"] == one["zero"] and acc["count"] == one["count"]
    assert acc["vmin"] == one["vmin"] and acc["vmax"] == one["vmax"]

    qs = (0.0, 0.25, 0.5, 0.75, 1.0)
    est = qsk_quantiles(acc, qs)
    alpha = (QSK_GAMMA - 1) / (QSK_GAMMA + 1)
    for q, e in zip(qs, est):
        # the sketch answers an ORDER STATISTIC (np.quantile's default
        # linearly interpolates BETWEEN order stats — a different,
        # weaker-at-small-n convention), so the guarantee is: within
        # relative error of one of the two bracketing order statistics
        lo = float(np.quantile(x, q, method="lower"))
        hi = float(np.quantile(x, q, method="higher"))
        ok = any(
            abs(e - true) <= alpha * abs(true) + 1e-9 for true in (lo, hi)
        )
        assert ok, (q, e, lo, hi)


def test_explain_predicate_tiers(tmp_table_dir):
    from fupi_ray.ops.analyze import explain_predicate

    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    ensure_quantile_sketches(t, columns=("n_tok",))
    x = _exact_n_tok(t)
    hi = int(np.quantile(x, 0.97))

    # zone tier: the fixture writes doc-id-ranged fragments, so a
    # doc_id range predicate prunes deterministically
    ez = explain_predicate(
        t, [("doc_id", "between", ("doc-000000000000", "doc-000000000099"))]
    )
    assert ez["zonemap_fragments"] < ez["total_fragments"]
    assert ez["zonemap_rows_upper"] < ez["total_rows"]

    # estimate tier + auto dispatch: narrow → DV, wide → COW
    e = explain_predicate(t, [("n_tok", ">", hi)])
    assert e["estimate_method"] == "ddsketch"
    true = int((x > hi).sum())
    assert abs(e["estimated_rows"] - true) <= max(5, 0.05 * true)
    assert e["auto_mutation_mode"] == "dv"  # ~3% of rows
    lo = int(np.quantile(x, 0.3))
    assert explain_predicate(t, [("n_tok", ">", lo)])["auto_mutation_mode"] == "cow"

    # bloom tier: a doc_id point miss that sorts INSIDE one fragment's
    # zone range (so zone maps alone cannot prune it) is killed by the
    # bloom sidecar probe
    e2 = explain_predicate(t, [("doc_id", "==", "doc-0000000005zz")])
    assert e2["zonemap_fragments"] >= 1
    assert e2.get("bloom_fragments") == 0
    assert e2.get("bloom_rows_upper") == 0


def test_heavy_hitter_sidecars(tmp_table_dir):
    import collections

    from fupi_ray.ops import column_heavy_hitters, ensure_hh_sketches
    from fupi_ray.ops.analyze import hh_path

    t = write_fragmented_table(tmp_table_dir, 2_000, rows_per_fragment=250, config=CFG)
    res = ensure_hh_sketches(t, columns=("source",))
    nfrags = len(t.manifest().fragments)
    assert res == {"built": nfrags, "cached": 0}
    assert ensure_hh_sketches(t, columns=("source",)) == {
        "built": 0,
        "cached": nfrags,
    }
    exact = collections.Counter(
        r["source"] for r in t.scan(columns=["source"]).take_all()
    )
    stats: dict = {}
    hh = column_heavy_hitters(
        t, columns=("source",), min_fraction=0.01, stats_out=stats
    )["source"]
    assert stats["fragments_missing"] == 0
    # the fixture has a handful of sources, all far above the residual:
    # every one is present with sound bounds, ranked by lower bound
    assert {h["value"] for h in hh} == set(exact)
    for h in hh:
        assert h["lower"] <= exact[h["value"]] <= h["upper"], (h, exact[h["value"]])
    assert hh[0]["lower"] == max(h["lower"] for h in hh)

    # bounds stay sound across a repack (layout independence of the
    # CONTRACT — the state itself may differ)
    compact(t)
    hh2 = column_heavy_hitters(t, columns=("source",), min_fraction=0.01)["source"]
    for h in hh2:
        assert h["lower"] <= exact[h["value"]] <= h["upper"]

    # GC with the owning fragment (fragments compaction left in place
    # stay live and keep their sidecars — check only the dead ones)
    old = {f.path for f in t.manifest(1).fragments}
    expire_snapshots(t, keep_last=1, gc_grace_seconds=0.0)
    live = {f.path for f in t.manifest().fragments}
    dead = old - live
    assert dead
    for rel in dead:
        assert not _fs.exists(hh_path(os.path.join(t.table_dir, rel)))

    with pytest.raises(ValueError, match="nested"):
        ensure_hh_sketches(t, columns=("tokens",))
