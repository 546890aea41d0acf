"""One-permutation MinHash (OPH) kernel: estimator + integration.

``minhash_signatures_oph`` must honor the same lane contract as the
classic kernel — P(lane equality) ≈ Jaccard, identical gram sets give
identical signatures — at ~1/P the compute (one mix pass instead of
one per permutation). Rotation densification (empty bucket borrows
the nearest filled bucket + distance*C) keeps sparse docs comparable
lane-by-lane.
"""

import numpy as np
import pyarrow as pa
import pytest

from fupi_ray.functions.textkernels import (
    minhash_signatures,
    minhash_signatures_oph,
)
from fupi_ray.ops.dedupdocs import _salts, token_signatures


def _sig(fn, vals, salts):
    u = np.unique(np.asarray(vals, dtype=np.uint64))
    return fn(u, np.array([0, len(u)], np.int64), salts)[:, 0]


class TestOphKernel:
    def test_identical_sets_identical_signatures(self):
        rng = np.random.default_rng(5)
        salts = _salts(32, 42)
        a = rng.integers(0, 2**63, 700).astype(np.uint64)
        assert np.array_equal(
            _sig(minhash_signatures_oph, a, salts),
            _sig(minhash_signatures_oph, a.copy(), salts),
        )

    def test_lane_equality_tracks_jaccard(self):
        rng = np.random.default_rng(11)
        salts = _salts(64, 42)
        base = rng.integers(0, 2**62, 4000).astype(np.uint64)
        for frac in (1.0, 0.8, 0.5, 0.2):
            k = int(4000 * frac)
            other = np.concatenate(
                [base[:k], rng.integers(2**62, 2**63, 4000 - k).astype(np.uint64)]
            )
            true_j = len(np.intersect1d(base, other)) / len(np.union1d(base, other))
            est = (
                _sig(minhash_signatures_oph, base, salts)
                == _sig(minhash_signatures_oph, other, salts)
            ).mean()
            # 64 lanes: allow ~3 sigma of binomial noise plus
            # densification variance
            assert abs(est - true_j) < 0.22, (frac, true_j, est)

    def test_disjoint_sets_rarely_agree(self):
        rng = np.random.default_rng(13)
        salts = _salts(64, 42)
        a = rng.integers(0, 2**61, 1000).astype(np.uint64)
        b = rng.integers(2**61, 2**62, 1000).astype(np.uint64)
        est = (
            _sig(minhash_signatures_oph, a, salts)
            == _sig(minhash_signatures_oph, b, salts)
        ).mean()
        assert est < 0.15

    def test_sparse_docs_densify_fully_and_deterministically(self):
        salts = _salts(32, 42)
        grams = np.array([7, 9, 11], dtype=np.uint64)  # 3 grams, 32 buckets
        st = np.array([0, 3], np.int64)
        s1 = minhash_signatures_oph(grams, st, salts)
        assert (s1 != np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        assert np.array_equal(s1, minhash_signatures_oph(grams, st, salts))
        # a doc sharing ALL grams still matches on every lane
        assert np.array_equal(s1, minhash_signatures_oph(grams.copy(), st, salts))

    def test_shape_matches_classic(self):
        rng = np.random.default_rng(3)
        salts = _salts(16, 1)
        lens = rng.integers(1, 40, 10)
        st = np.zeros(11, np.int64)
        np.cumsum(lens, out=st[1:])
        grams = rng.integers(0, 2**63, int(st[-1])).astype(np.uint64)
        assert (
            minhash_signatures_oph(grams, st, salts).shape
            == minhash_signatures(grams, st, salts).shape
            == (16, 10)
        )


class TestTokenSignatureScheme:
    def test_schemes_diverge_but_both_self_consistent(self):
        salts = _salts(32, 42)
        col = pa.array([list(range(200)), list(range(100, 300))], pa.list_(pa.int32()))
        oph = token_signatures(col, salts, 8)  # default scheme
        cls = token_signatures(col, salts, 8, scheme="classic")
        assert oph.shape == cls.shape
        assert not np.array_equal(oph, cls)  # different estimators
        assert np.array_equal(oph, token_signatures(col, salts, 8, scheme="oph"))

    def test_empty_and_tiny_docs(self):
        salts = _salts(32, 42)
        col = pa.array([[], [5], [5, 6]], pa.list_(pa.int32()))
        s = token_signatures(col, salts, 8)
        assert s.shape == (3, 32)
        # identical single-gram docs → identical rows
        s2 = token_signatures(pa.array([[5]], pa.list_(pa.int32())), salts, 8)
        assert np.array_equal(s[1], s2[0])


class TestSidecarSchemeIdentity:
    def test_scheme_switch_invalidates_sidecar(self, tmp_table_dir):
        import glob

        import ray

        from fupi_ray.fixtures import write_fragmented_table
        from fupi_ray.ops.dedupdocs import _fragment_sig_task

        t = write_fragmented_table(tmp_table_dir, 200, rows_per_fragment=200)
        m = t.manifest()
        f = m.fragments[0]
        args = (t.table_dir, f.path, None, {}, 32, 8, 42, "string")
        a = ray.get(_fragment_sig_task.remote(*args, "oph"))
        b = ray.get(_fragment_sig_task.remote(*args, "classic"))
        c = ray.get(_fragment_sig_task.remote(*args, "oph"))
        assert a.num_rows == b.num_rows == c.num_rows == 200
        assert a["sig"].to_pylist() != b["sig"].to_pylist()
        assert a["sig"].to_pylist() == c["sig"].to_pylist()
        assert glob.glob(f"{tmp_table_dir}/data/*.sigs")
