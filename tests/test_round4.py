"""Round-4 additions: production fingerprint, capped fan-out,
Cyrillic text tier, row-group pruning, WAP/expiry races, ONNX probe."""

import numpy as np
import pyarrow as pa
import pytest

from fupi_ray.stages import text as tx


def _doc_batch(texts):
    return pa.table(
        {"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts}
    )


class TestFingerprintFast:
    def test_same_equivalence_classes_as_md5(self):
        texts = [
            "Hello, World!",
            "hello world",          # same normalized content as above
            "HELLO  ...  WORLD",    # same again
            "goodbye world",
            "Goodbye, world?",      # same as previous
            "",                     # empty after normalization
            "!!!",                  # also empty after normalization
            None,                   # null → '' → same class as empty
        ]
        b = _doc_batch(texts)
        md5_fp = tx.fingerprint(b)["fp"].to_pylist()
        fast_fp = tx.fingerprint_fast(b)["fp64"].to_pylist()
        # grouping by md5 and by fp64 must induce the same partition
        groups_md5 = {}
        groups_fast = {}
        for i, (m, f) in enumerate(zip(md5_fp, fast_fp)):
            groups_md5.setdefault(m, set()).add(i)
            groups_fast.setdefault(f, set()).add(i)
        assert sorted(map(sorted, groups_md5.values())) == sorted(
            map(sorted, groups_fast.values())
        )

    def test_deterministic_across_calls(self):
        b = _doc_batch(["alpha beta", "gamma delta", "ALPHA beta!"])
        a = tx.fingerprint_fast(b)["fp64"].to_pylist()
        c = tx.fingerprint_fast(b)["fp64"].to_pylist()
        assert a == c
        assert a[0] == a[2]  # same normalized content
        assert a[0] != a[1]

    def test_output_type_int64(self):
        out = tx.fingerprint_fast(_doc_batch(["x"]))
        assert out.schema.field("fp64").type == pa.int64()


class TestCyrillicTier:
    """The reference corpus is Bulgarian (pysbd language='bg',
    /root/reference/fupi/data.py:33-36) — langid and segmentation must
    handle Cyrillic, mirrored exactly in the duckdb twins."""

    BG_TEXTS = [
        "Това е изречение на български. И още едно! Проф. Иванов "
        "живее на ул. Шипка в гр. София.",
        "Той каза: т.е. например, и т.н. после. А. Б. Петров дойде.",
        "и в на не се да е за от че",
    ]

    def test_langid_predicts_bg(self):
        b = pa.table(
            {
                "doc_id": ["d0", "d1", "d2", "d3"],
                "text": self.BG_TEXTS + ["the quick brown fox is in the house"],
            }
        )
        pred = tx.langid_batch(b)["pred_lang"].to_pylist()
        assert pred == ["bg", "bg", "bg", "en"]

    def test_langid_sql_twin_matches(self):
        import duckdb

        from fupi_ray.pipelines import queries as q

        b = pa.table(
            {
                "doc_id": ["d0", "d1", "d2"],
                "lang": ["bg", "bg", "en"],
                "text": [self.BG_TEXTS[0], self.BG_TEXTS[2], "the cat is on the mat"],
            }
        )
        out = tx.langid_batch(b)
        py = sorted(zip(out["lang"].to_pylist(), out["pred_lang"].to_pylist()))
        con = duckdb.connect()
        con.register("documents", b.to_pandas())
        rows = con.execute(q.SQL_LANGID).fetchall()
        sq = sorted((r[0], r[1]) for r in rows for _ in range(int(r[2])))
        assert py == sq

    def test_segmentation_bulgarian_abbrevs(self):
        b = pa.table({"doc_id": ["d0", "d1"], "text": self.BG_TEXTS[:2]})
        seg = tx.segment_sentences(b)
        sents = seg["sentence"].to_pylist()
        assert "Проф. Иванов живее на ул. Шипка в гр. София." in sents
        assert "Той каза: т.е. например, и т.н. после." in sents
        assert "А. Б. Петров дойде." in sents
        assert seg.num_rows == 5

    def test_segmentation_sql_twin_matches_on_cyrillic(self):
        import duckdb

        from fupi_ray.pipelines import queries as q

        b = pa.table(
            {
                "doc_id": [f"d{i}" for i in range(len(self.BG_TEXTS))],
                "text": self.BG_TEXTS,
            }
        )
        seg = tx.segment_sentences(b)
        py = sorted(
            zip(
                seg["doc_id"].to_pylist(),
                seg["sentence_id"].to_pylist(),
                seg["sentence"].to_pylist(),
            )
        )
        con = duckdb.connect()
        con.register("documents", b.to_pandas())
        sq = sorted(
            (r[0], r[1], r[2])
            for r in con.execute(q.SQL_SEGMENT_SENTENCES).fetchall()
        )
        assert py == sq


class TestRowGroupPruning:
    def test_selective_predicate_skips_row_groups(self, tmp_table_dir):
        import ray

        from fupi_ray.config import EngineConfig
        from fupi_ray.fixtures import generate_rows
        from fupi_ray.table import Table

        cfg = EngineConfig(row_group_rows=64)
        t = Table.create(tmp_table_dir, config=cfg)
        rows = generate_rows(0, 1024)  # ordered doc_ids → tight rg stats
        t.commit_append(ray.data.from_arrow(rows), target_fragment_rows=512)

        lo = rows["doc_id"][3].as_py()
        hi = rows["doc_id"][40].as_py()
        stats = t.row_group_prune_stats([("doc_id", "between", (lo, hi))])
        # 1024 rows / 64-row groups = 16 groups in 2 fragments; zone
        # maps keep only the fragment containing the range, footer
        # stats then skip most of ITS groups
        assert stats["fragments_after_zone_maps"] < stats["fragments_total"] or (
            stats["fragments_total"] == 1
        )
        assert stats["row_groups_in_survivors"] >= 8
        assert (
            stats["row_groups_after_footer_stats"]
            < stats["row_groups_in_survivors"]
        )
        # and the pruned scan still returns exactly the right rows
        got = t.scan(predicate=[("doc_id", "between", (lo, hi))]).count()
        assert got == 38

    def test_scan_results_identical_with_and_without_pushdown(self, tmp_table_dir):
        import ray

        from fupi_ray.config import EngineConfig
        from fupi_ray.fixtures import generate_rows
        from fupi_ray.table import Table

        cfg = EngineConfig(row_group_rows=32)
        t = Table.create(tmp_table_dir, config=cfg)
        rows = generate_rows(0, 300)
        t.commit_append(ray.data.from_arrow(rows))
        pred = [("n_tok", ">=", 50)]
        pushed = sorted(
            r["doc_id"] for r in t.scan(predicate=pred, columns=["doc_id"]).take_all()
        )
        full = sorted(
            r["doc_id"]
            for r in t.scan(columns=["doc_id", "n_tok"]).take_all()
            if r["n_tok"] >= 50
        )
        assert pushed == full and len(pushed) > 0


class TestOnnxRealPath:
    """Exercises FeatureHashEmbedder's real='auto' backend when
    onnxruntime is importable (not in this container — skips here, runs
    on runtime-equipped hosts). The fixture is a hand-encoded ONNX
    MatMul against a reversal matrix, so the expected embedding is the
    stub embedding with buckets reversed."""

    FIXTURE = "tests/fixtures/tiny_projection.onnx"

    def test_fixture_bytes_are_committed_and_deterministic(self):
        import os
        import sys

        sys.path.insert(0, "tools")
        try:
            import make_onnx_fixture as gen
        finally:
            sys.path.pop(0)
        assert os.path.exists(self.FIXTURE)
        blob = gen.build_model(64)
        with open(self.FIXTURE, "rb") as f:
            assert f.read() == blob
        assert [f for f, _ in gen._walk(blob)] == [1, 2, 7, 8]

    def test_session_path_matches_reversed_stub(self):
        # runs on EVERY host: onnxruntime when importable, else the
        # pure-numpy single-MatMul executor (stages/onnx_mini.py) —
        # either way the real session->run->attach path executes
        from fupi_ray.stages.similarity import FeatureHashEmbedder

        b = _doc_batch(["hello world", "the quick brown fox", "а това е текст"])
        stub = FeatureHashEmbedder(dim=64)
        real = FeatureHashEmbedder(dim=64, model_path=self.FIXTURE)
        assert real.session is not None
        v_stub = np.asarray(stub(b)["vec"].to_pylist(), dtype=np.float64)
        v_real = np.asarray(real(b)["vec"].to_pylist(), dtype=np.float64)
        assert np.allclose(v_real, v_stub[:, ::-1], atol=1e-6)

    def test_mini_executor_rejects_unsupported_graphs(self, tmp_path):
        from fupi_ray.stages.onnx_mini import MiniSession, UnsupportedOnnx

        bad = tmp_path / "bad.onnx"
        bad.write_bytes(b"")  # no graph at all
        with pytest.raises(UnsupportedOnnx):
            MiniSession(str(bad))


class TestWapExpiryRace:
    """Concurrent publish_stage vs expire_snapshots vs rebasing appends
    on one table: no staged fragment may be GC'd before publish/abort,
    the stage lands exactly once, and the final manifest only references
    files that exist. The stage is BACKDATED past any grace period —
    the scenario no grace window covers (a stage published mid-expiry),
    closed by expire's records-before-manifests liveness order."""

    def _backdate(self, table_dir, seconds=7200):
        import os
        import time as _t

        old = _t.time() - seconds
        ddir = os.path.join(table_dir, "data")
        for name in os.listdir(ddir):
            os.utime(os.path.join(ddir, name), (old, old))

    def test_publish_expire_append_race(self, tmp_table_dir):
        import random
        import threading
        import time as _t

        import ray

        from fupi_ray.config import EngineConfig
        from fupi_ray.fixtures import generate_rows
        from fupi_ray.ops import expire_snapshots
        from fupi_ray.ops import stage as wap
        from fupi_ray.table import Table

        cfg = EngineConfig(expire_keep_last=1, bloom_bits_per_key=None)
        t = Table.create(tmp_table_dir, config=cfg)
        t.commit_append(ray.data.from_arrow(generate_rows(0, 200)))
        t.commit_append(ray.data.from_arrow(generate_rows(200, 100)))
        stage_id = wap.stage_append(
            t, ray.data.from_arrow(generate_rows(1000, 80))
        )
        staged_paths = {f.path for f in wap.staged_fragment_metas(t, stage_id)}
        # everything so far is "old": staged fragments are older than
        # the grace period, so only record/manifest liveness keeps them
        self._backdate(tmp_table_dir)

        publish_versions: list[int] = []
        errors: list[BaseException] = []
        lock = threading.Lock()

        def publisher(i):
            _t.sleep(random.uniform(0, 0.05))
            try:
                v = wap.publish_stage(t, stage_id)
                with lock:
                    publish_versions.append(v)
            except FileNotFoundError:
                pass  # a concurrent publisher already won and cleaned up
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)

        def appender(i):
            try:
                t.commit_append(
                    ray.data.from_arrow(generate_rows(2000 + i * 100, 50))
                )
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)

        def expirer(i):
            try:
                for _ in range(3):
                    # grace 5s protects the in-flight appends (fresh
                    # files); the backdated stage is NOT grace-protected
                    expire_snapshots(t, gc_grace_seconds=5.0)
                    _t.sleep(random.uniform(0, 0.02))
            except BaseException as e:  # noqa: BLE001
                with lock:
                    errors.append(e)

        threads = (
            [threading.Thread(target=publisher, args=(i,)) for i in range(3)]
            + [threading.Thread(target=appender, args=(i,)) for i in range(2)]
            + [threading.Thread(target=expirer, args=(i,)) for i in range(2)]
        )
        random.shuffle(threads)
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        assert not errors, errors
        assert publish_versions, "no publisher succeeded"
        # final state: every manifest-referenced file exists
        import os

        m = t.manifest()
        for f in m.fragments:
            assert os.path.exists(os.path.join(tmp_table_dir, f.path)), f.path
        # the stage's fragments were never GC'd and landed exactly once
        assert staged_paths <= {f.path for f in m.fragments}
        rows = t.scan().take_all()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids)) == 200 + 100 + 80 + 2 * 50
        staged_ids = {r["doc_id"] for r in generate_rows(1000, 80).to_pylist()}
        assert staged_ids <= set(ids)
        # the staging record is gone (consumed by the winning publish)
        assert not os.path.exists(
            os.path.join(tmp_table_dir, "manifest", "staged", f"{stage_id}.json")
        )


class TestFanout:
    def test_run_capped_matches_uncapped(self):
        import ray

        from fupi_ray.ops import _fanout

        @ray.remote
        def sq(x):
            return x * x

        args = [(i,) for i in range(17)]
        for cap in (1, 3, 100):
            assert _fanout.run_capped(sq, args, cap) == [i * i for i in range(17)]
        assert _fanout.run_capped(sq, [], 4) == []

    def test_copy_concurrency_cap_bounds(self):
        from fupi_ray.ops import _fanout

        cap = _fanout.copy_concurrency_cap(8)
        # single node in tests: cap is 8 clamped to cluster CPUs (4)
        assert 1 <= cap <= 8

    def test_auto_cap_probes_and_caches(self):
        from fupi_ray.ops import _fanout

        _fanout._MEASURED_CAP = None
        cap = _fanout.copy_concurrency_cap("auto")
        # test session has 4 CPUs (<= floor): probe short-circuits
        assert 1 <= cap <= 8
        assert _fanout._MEASURED_CAP == cap
        assert _fanout.copy_concurrency_cap("auto") == cap


def test_read_blocks_sized_by_file_not_cpus():
    """pipelines.read must size block count from file bytes (>=1 MB
    per block, capped at 4x cluster CPUs) — Ray's CPU-proportional
    default shattered small inputs into dozens of near-empty blocks
    and made fixed-size queries SLOWER as the cluster grew."""
    import os

    import ray as _ray

    from fupi_ray.pipelines.queries import read

    sf = "/root/testdata/sf0.001"
    ds = read(sf, "customer", columns=["c_custkey"])
    size = os.path.getsize(os.path.join(sf, "customer.parquet"))
    expect = max(1, min(-(-size // (1024 * 1024)),
                        4 * int(_ray.cluster_resources().get("CPU", 8))))
    mat = ds.materialize()
    assert mat.num_blocks() == expect
    assert mat.count() > 0
