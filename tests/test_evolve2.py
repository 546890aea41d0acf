"""Column rename + type widening: metadata-only evolution must be
invisible to every downstream op — scans (plain/predicate/DV), COW and
MOR mutations, MERGE both strategies, compaction, clustering, CDC —
and time travel must keep serving each snapshot under ITS OWN schema.

Rename targets USER columns (the engine-reserved doc_id / n_tok /
source keep their names; the fixture table carries an extra physical
``lang`` column for the rename cases). Widening exercises the
engine's own ``n_tok`` (int32 -> int64).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from fupi_ray.config import EngineConfig
from fupi_ray.fixtures import generate_rows
from fupi_ray.ops import (
    add_column,
    changelog,
    cluster,
    compact,
    delete_where,
    merge_into,
    rename_column,
    update_where,
    widen_column,
)
from fupi_ray.ops.evolve import SchemaEvolutionError
from fupi_ray.state import fs as _fs
from fupi_ray.table import Table

CFG = EngineConfig(target_fragment_bytes=256 * 1024)


def rows_with_lang(start: int, n: int, token_salt: int = 0) -> pa.Table:
    t = generate_rows(start, n, token_salt=token_salt)
    ids = np.arange(start, start + n)
    lang = np.where(ids % 3 == 0, "bg", "en").astype(object)
    return t.append_column("lang", pa.array(lang, pa.string()))


@pytest.fixture()
def tbl(tmp_path):
    t = Table.create(str(tmp_path / "t"), config=CFG)
    t.commit_append(
        ray.data.from_arrow(rows_with_lang(0, 1_000)), target_fragment_rows=200
    )
    return t


def sorted_df(t: Table, version=None, columns=None) -> pd.DataFrame:
    df = t.scan(version, columns=columns).to_pandas()
    if "tokens" in df.columns:
        df["tokens"] = df["tokens"].map(
            lambda a: tuple(a.tolist() if hasattr(a, "tolist") else a)
        )
    return df.sort_values("doc_id").reset_index(drop=True)


# -- rename -------------------------------------------------------------------


def test_rename_is_metadata_only_and_scans_serve_old_files(tbl):
    before = sorted_df(tbl)
    paths_before = {f.path for f in tbl.manifest().fragments}
    v = rename_column(tbl, "lang", "language")
    m = tbl.manifest(v)
    assert m.operation == "rename-column"
    assert {f.path for f in m.fragments} == paths_before  # nothing rewritten
    assert "language" in m.schema_names and "lang" not in m.schema_names
    got = sorted_df(tbl)
    want = before.rename(columns={"lang": "language"})
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # time travel: the parent still serves the OLD name
    old = sorted_df(tbl, m.parent_version)
    assert "lang" in old.columns and "language" not in old.columns


def test_rename_predicate_scan_and_projection(tbl):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    got = sorted_df(tbl, columns=["doc_id", "language"])
    assert got.columns.tolist() == ["doc_id", "language"]
    # predicate on the renamed column falls to the in-memory mask
    sel = tbl.scan(
        predicate=[("language", "==", "bg")], columns=["doc_id", "language"]
    ).to_pandas()
    want = before[before.lang == "bg"]
    assert len(sel) == len(want)
    assert set(sel.language) == {"bg"}
    # mixed predicate: pushdown column + renamed column
    sel2 = tbl.scan(
        predicate=[("language", "==", "bg"), ("n_tok", "<", 200)]
    ).to_pandas()
    assert len(sel2) == len(before[(before.lang == "bg") & (before.n_tok < 200)])


def test_rename_guards(tbl):
    for reserved in ("doc_id", "n_tok", "source"):
        with pytest.raises(SchemaEvolutionError, match="reserved"):
            rename_column(tbl, reserved, "x")
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        rename_column(tbl, "lang", "n_tok")
    with pytest.raises(SchemaEvolutionError, match="no column"):
        rename_column(tbl, "nope", "x")
    with pytest.raises(SchemaEvolutionError, match="invalid"):
        rename_column(tbl, "lang", "_hidden")


def test_rename_then_compact_materializes_new_name(tbl):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    v = compact(tbl)
    assert v is not None
    got = sorted_df(tbl)
    want = before.rename(columns={"lang": "language"})
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # compaction wrote files under the NEW name
    m = tbl.manifest(v)
    frag = next(f for f in m.fragments if f.path.startswith("data/cp-"))
    raw = _fs.read_parquet_table(_fs.join(tbl.table_dir, frag.path))
    assert "language" in raw.column_names and "lang" not in raw.column_names


def test_rename_then_cluster_preserves_data(tbl):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    cluster(tbl, curve="zorder")
    got = sorted_df(tbl)
    want = before.rename(columns={"lang": "language"})
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_rename_then_merge_roundtrips(tbl, strategy):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    upd = rows_with_lang(100, 50, token_salt=3).rename_columns(
        ["language" if c == "lang" else c for c in rows_with_lang(0, 1).column_names]
    )
    upd = upd.append_column("_src_order", pa.array(np.arange(50, dtype=np.int64)))
    v = merge_into(tbl, ray.data.from_arrow(upd), strategy=strategy)
    got = sorted_df(tbl, v)
    assert len(got) == 1_000
    upd_ids = {f"doc-{i:012d}" for i in range(100, 150)}
    untouched = got[~got.doc_id.isin(upd_ids)].reset_index(drop=True)
    want_unt = (
        before[~before.doc_id.isin(upd_ids)]
        .rename(columns={"lang": "language"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(untouched, want_unt[untouched.columns.tolist()])
    want_upd = generate_rows(100, 50, token_salt=3).to_pandas()
    got_upd = got[got.doc_id.isin(upd_ids)].reset_index(drop=True)
    for a, b in zip(got_upd.tokens, want_upd.sort_values("doc_id").tokens):
        assert list(a) == list(b)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_rename_then_mutations_on_renamed_column(tbl, mode):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    v = delete_where(tbl, [("language", "==", "en")], mode=mode)
    got = sorted_df(tbl, v)
    want = before[before.lang != "en"].rename(columns={"lang": "language"})
    pd.testing.assert_frame_equal(
        got, want[got.columns.tolist()].reset_index(drop=True)
    )
    v2 = update_where(
        tbl, [("language", "==", "bg")], {"language": "bul"}, mode=mode
    )
    got2 = sorted_df(tbl, v2)
    assert set(got2.language) == {"bul"}


def test_rename_changelog_dv_fast_path(tbl):
    rename_column(tbl, "lang", "language")
    v0 = tbl.latest_version()
    delete_where(tbl, [("doc_id", "<", "doc-000000000020")], mode="dv")
    cdc = changelog(tbl, v0, tbl.latest_version()).to_pandas()
    assert len(cdc) == 20
    assert "language" in cdc.columns and set(cdc.change_type) == {"delete"}
    assert set(cdc.language) <= {"bg", "en"}


def test_rename_chain_and_reuse_of_old_name(tbl):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "idioma")
    rename_column(tbl, "idioma", "language")
    got = sorted_df(tbl)
    want = before.rename(columns={"lang": "language"})
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # re-adding the RETIRED old name mints a fresh id: old file data
    # must NOT resurrect under it
    add_column(tbl, "lang", "string", default="fresh")
    df = sorted_df(tbl)
    assert set(df.lang) == {"fresh"}
    assert set(df.language) == set(before.lang)


# -- widen --------------------------------------------------------------------


def test_widen_is_metadata_only_and_scans_cast(tbl):
    before = sorted_df(tbl)
    paths_before = {f.path for f in tbl.manifest().fragments}
    v = widen_column(tbl, "n_tok", "int64")
    m = tbl.manifest(v)
    assert m.operation == "widen-column"
    assert {f.path for f in m.fragments} == paths_before
    assert m.schema_types[m.schema_names.index("n_tok")] == "int64"
    got = tbl.scan().to_pandas()
    assert got.n_tok.dtype == np.int64
    assert sorted(got.n_tok) == sorted(before.n_tok)
    # time travel: parent still int32
    old = tbl.scan(m.parent_version).to_pandas()
    assert old.n_tok.dtype == np.int32


def test_widen_guards(tbl):
    with pytest.raises(SchemaEvolutionError, match="cannot widen"):
        widen_column(tbl, "n_tok", "int16")  # narrowing
    with pytest.raises(SchemaEvolutionError, match="cannot widen"):
        widen_column(tbl, "lang", "int64")  # string -> int
    with pytest.raises(SchemaEvolutionError, match="no column"):
        widen_column(tbl, "nope", "int64")
    # no-op widen returns the current version without a commit
    v = tbl.latest_version()
    assert widen_column(tbl, "n_tok", "int32") == v


def test_widen_predicate_pushdown_still_works(tbl):
    widen_column(tbl, "n_tok", "int64")
    got = tbl.scan(predicate=[("n_tok", "between", (100, 200))]).to_pandas()
    assert got.n_tok.between(100, 200).all()
    assert got.n_tok.dtype == np.int64


def test_widen_then_append_mixes_physical_types(tbl):
    widen_column(tbl, "n_tok", "int64")
    new = rows_with_lang(5_000, 100)
    new = new.set_column(
        new.column_names.index("n_tok"), "n_tok", new["n_tok"].cast(pa.int64())
    )
    tbl.commit_append(ray.data.from_arrow(new))
    got = tbl.scan().to_pandas()
    assert len(got) == 1_100 and got.n_tok.dtype == np.int64
    # compaction materializes everything wide and drops the stamps
    compact(tbl)
    assert not any(f.col_types for f in tbl.manifest().fragments)
    assert tbl.scan().to_pandas().n_tok.dtype == np.int64


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_widen_then_delete_keeps_wide_scan(tbl, mode):
    widen_column(tbl, "n_tok", "int64")
    v = delete_where(tbl, [("n_tok", ">", 300)], mode=mode)
    got = tbl.scan(v).to_pandas()
    assert (got.n_tok <= 300).all() and got.n_tok.dtype == np.int64


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_widen_then_merge_both_strategies(tbl, strategy):
    widen_column(tbl, "n_tok", "int64")
    src = rows_with_lang(200, 30, token_salt=9)
    src = src.set_column(
        src.column_names.index("n_tok"), "n_tok", src["n_tok"].cast(pa.int64())
    )
    src = src.append_column("_src_order", pa.array(np.arange(30, dtype=np.int64)))
    v = merge_into(tbl, ray.data.from_arrow(src), strategy=strategy)
    got = tbl.scan(v).to_pandas()
    assert len(got) == 1_000 and got.n_tok.dtype == np.int64


def test_widen_changelog_casts_old_fragments(tbl):
    widen_column(tbl, "n_tok", "int64")
    v0 = tbl.latest_version()
    delete_where(tbl, [("doc_id", "<", "doc-000000000010")], mode="dv")
    cdc = changelog(tbl, v0, tbl.latest_version())
    df = cdc.to_pandas()
    assert len(df) == 10 and df.n_tok.dtype == np.int64


def test_rename_and_widen_compose(tbl):
    before = sorted_df(tbl)
    rename_column(tbl, "lang", "language")
    widen_column(tbl, "n_tok", "int64")
    got = sorted_df(tbl)
    assert got.n_tok.dtype == np.int64
    want = before.rename(columns={"lang": "language"})
    want["n_tok"] = want["n_tok"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    compact(tbl)
    got2 = sorted_df(tbl)
    pd.testing.assert_frame_equal(got2, want[got2.columns.tolist()])
