"""Two-phase exchange optimizations: equivalence regression tests.

Three hot paths gained a counting pre-pass this round; each must stay
bit-identical (or set-identical where only set semantics are promised)
to its single-exchange ancestor:

1. LSH hot-key prefilter (``stages/dedup.hot_band_keys`` /
   ``filter_hot_keys``): only band keys on >= 2 rows enter the
   id-carrying pair exchange.
2. Broadcast-key collect (``ops/merge._collect_broadcast_keys``):
   Arrow-native fixed-width byte matrix replacing the object-dtype
   driver sort/encode; ``_zone_overlaps_keys`` replaces the
   searchsorted-on-objects zone prune (incl. bounds longer than the
   matrix width).
3. MERGE source dedup (``ops/merge._dedup_source``): hashes-only
   duplicate pre-count skips or shrinks the payload exchange.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fupi_ray.functions.hashing import stable_hash
from fupi_ray.ops.merge import (
    _collect_broadcast_keys,
    _dedup_source,
    _zone_overlaps_keys,
)
from fupi_ray.stages.dedup import (
    _grouped_pairs,
    dedup_pairs,
    filter_hot_keys,
    hot_band_keys,
)


def _pairs_set(ds):
    return {(r["id_a"], r["id_b"]) for r in ds.take_all()}


class TestHotKeyPrefilter:
    def _banded(self, rows):
        t = pa.table(
            {
                "id": pa.array([r[0] for r in rows]),
                "band_key": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        return rd.from_arrow(t)

    def test_prefiltered_pairs_equal_unfiltered(self):
        rng = np.random.default_rng(7)
        rows = [(f"d{i:04d}", int(rng.integers(0, 1 << 40))) for i in range(500)]
        # plant shared keys: 3 groups of sizes 2, 3, 5
        rows += [(f"x{i}", 111) for i in range(2)]
        rows += [(f"y{i}", 222) for i in range(3)]
        rows += [(f"z{i}", 333) for i in range(5)]
        banded = self._banded(rows).materialize()
        base = _pairs_set(dedup_pairs(_grouped_pairs(banded, ["band_key"])))
        hot = hot_band_keys(banded)
        assert hot is not None and len(hot) == 3
        filt = _pairs_set(
            dedup_pairs(_grouped_pairs(filter_hot_keys(banded, hot), ["band_key"]))
        )
        assert filt == base and len(base) == 1 + 3 + 10

    def test_cap_exceeded_falls_back(self):
        rows = [("a", 5), ("b", 5), ("c", 9), ("d", 9)]
        banded = self._banded(rows).materialize()
        assert hot_band_keys(banded, cap=1) is None  # 2 hot keys > cap

    def test_local_duplicate_in_one_block_detected(self):
        # both rows of a hot key inside ONE block: the local np.unique
        # pre-reduction must still mark it hot (maxc path)
        rows = [("a", 42), ("a2", 42), ("b", 7)]
        banded = self._banded(rows).materialize()
        hot = hot_band_keys(banded)
        assert hot is not None and list(hot) == [42]

    def test_empty_hot_set_filters_everything(self):
        banded = self._banded([("a", 1), ("b", 2)]).materialize()
        hot = hot_band_keys(banded)
        assert hot is not None and len(hot) == 0
        assert filter_hot_keys(banded, hot).count() == 0


class TestCollectBroadcastKeys:
    def _old(self, keys_list):
        keys = np.sort(np.array(keys_list, dtype=object))
        h = stable_hash(keys)
        order = np.argsort(h, kind="stable")
        return h[order], np.char.encode(keys[order].astype(str), "utf-8")

    def test_probe_arrays_match_object_path(self):
        rng = np.random.default_rng(3)
        keys = [f"doc-{int(i):09d}" for i in rng.permutation(2000)]
        keys += ["", "a", "Z" * 40]  # empty + short + long
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(keys)})).materialize()
        kb_lex, h_new, kb_new = _collect_broadcast_keys(ds)
        h_old, kb_old = self._old(keys)
        assert np.array_equal(h_old, h_new)
        assert np.array_equal(kb_old.astype(kb_new.dtype), kb_new)
        assert kb_lex.dtype.kind == "S" and len(kb_lex) == len(keys)

    def test_zone_overlap_matches_object_semantics(self):
        keys = sorted(f"k{int(i):05d}" for i in range(100, 200))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(list(np.random.default_rng(1).permutation(keys)))})
        ).materialize()
        kb_lex, _, _ = _collect_broadcast_keys(ds)
        keys_obj = np.array(keys, dtype=object)

        def old_hit(zmin, zmax):
            lo_i = np.searchsorted(keys_obj, zmin, side="left")
            return bool(lo_i < len(keys_obj) and keys_obj[lo_i] <= zmax)

        cases = [
            ("k00000", "k00099"),  # entirely below
            ("k00201", "k99999"),  # entirely above
            ("k00150", "k00150"),  # point hit
            ("k00150x", "k00150x"),  # point miss between keys
            ("a", "z"),  # superset
            ("k00150" + "q" * 30, "k00199" + "q" * 30),  # bounds longer than width
            ("k00199" + "q" * 30, "k00199" + "z" * 30),  # long bounds, miss
        ]
        for zmin, zmax in cases:
            assert _zone_overlaps_keys(kb_lex, zmin, zmax) == old_hit(zmin, zmax), (
                zmin,
                zmax,
            )

    def test_embedded_nul_falls_back_to_object_path(self):
        keys = ["a\x00b", "a", "b"]
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(keys)})).materialize()
        kb_lex, h_new, kb_new = _collect_broadcast_keys(ds)
        assert kb_lex.dtype.kind == "O"  # object fallback
        h_old, kb_old = self._old(keys)
        assert np.array_equal(h_old, h_new)
        assert np.array_equal(kb_old, kb_new)


class TestSubstrPrefilterScalePath:
    def test_forced_prefilter_matches_small_path(self, monkeypatch):
        # the sf fixtures sit below the 64 MiB gate, so CI would never
        # exercise the hot-window prefilter without forcing it
        from fupi_ray.pipelines import queries as q

        sf = "/root/testdata/sf0.001"
        small_det = q.q_dedup_substring(sf).to_pandas()
        small_rm = q.q_dedup_substring_rm(sf).to_pandas()
        monkeypatch.setattr(q, "_SUBSTR_PREFILTER_MIN_BYTES", 0)
        big_det = q.q_dedup_substring(sf).to_pandas()
        big_rm = q.q_dedup_substring_rm(sf).to_pandas()

        def norm(df):
            df = df[sorted(df.columns)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        assert norm(small_det).equals(norm(big_det))
        assert norm(small_rm).equals(norm(big_rm))


class TestTwoPhaseSourceDedup:
    def _src(self, ids, toks):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "tokens": pa.array(toks, pa.list_(pa.int32())),
                    "n_tok": pa.array([len(x) for x in toks], pa.int32()),
                    "source": pa.array(["s"] * len(ids)),
                }
            )
        ).materialize()

    def test_clean_feed_passes_through(self):
        src = self._src([f"k{i}" for i in range(50)], [[i] for i in range(50)])
        out = _dedup_source(src, 8)
        assert out.count() == 50
        assert "_src_order" not in out.schema().names

    def test_duplicates_resolved_identically_to_full_exchange(self):
        ids = ["a", "b", "c", "a", "d", "b", "e", "a"]
        toks = [[1, 2], [3], [4, 5, 6], [9, 9], [7], [3], [8], [0]]
        src = self._src(ids, toks)
        out = sorted(
            (r["doc_id"], tuple(r["tokens"]))
            for r in _dedup_source(src, 8).take_all()
        )
        # deterministic: keep-first is min content hash per key,
        # independent of block arrival order — a second run agrees
        out2 = sorted(
            (r["doc_id"], tuple(r["tokens"]))
            for r in _dedup_source(src, 8).take_all()
        )
        assert out == out2
        assert [k for k, _ in out] == ["a", "b", "c", "d", "e"]

    def test_empty_source(self):
        src = self._src([], [])
        assert _dedup_source(src, 8).count() == 0
