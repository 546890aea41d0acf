"""Gopher repetition signals + Lee-et-al duplicated-substring
detection: kernel unit tests (character-window extraction, whitespace
tokenization) and end-to-end duckdb-twin parity on a handcrafted corpus
covering the edges the synthetic testdata can't reach (empty text,
sub-width docs, Cyrillic windows, degenerate repetition)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fupi_ray.functions import textkernels as tk
from fupi_ray.pipelines import queries as q


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _py_windows(text: str, width: int, stride: int) -> list[str]:
    if len(text) < width:
        return []
    return [text[k * stride : k * stride + width] for k in range((len(text) - width) // stride + 1)]


def test_char_windows_ascii_matches_python_reference():
    rng = np.random.default_rng(7)
    texts = [
        "".join(rng.choice(list("abcde "), size=int(n)))
        for n in rng.integers(0, 200, size=40)
    ] + ["", "x" * 49, "y" * 50, "z" * 51]
    wins, doc_idx, n_win, cw = tk.char_windows(pa.array(texts), 50, 25)
    assert cw == 1
    expected = [_py_windows(t, 50, 25) for t in texts]
    assert n_win.tolist() == [len(e) for e in expected]
    flat = [w for e in expected for w in e]
    got = [bytes(row).decode() for row in wins]
    assert got == flat
    assert doc_idx.tolist() == [i for i, e in enumerate(expected) for _ in e]


def test_char_windows_cyrillic_utf32_path():
    texts = ["щука " * 30, "пяток " * 20, "абв"]  # < width char doc last
    wins, doc_idx, n_win, cw = tk.char_windows(pa.array(texts), 50, 25)
    assert cw == 4
    expected = [_py_windows(t, 50, 25) for t in texts]
    assert n_win.tolist() == [len(e) for e in expected]
    got = [bytes(row).decode("utf-32-le") for row in wins]
    assert got == [w for e in expected for w in e]


def test_flat_tokens_drops_empty_and_keeps_case():
    toks, doc_idx, lengths = tk.flat_tokens(pa.array(["  A b  ", "", "c\t\nD"]))
    assert toks.tolist() == ["A", "b", "c", "D"]
    assert doc_idx.tolist() == [0, 0, 2, 2]
    assert lengths.tolist() == [2, 0, 2]


def test_top_gram_frac_basics():
    # doc0: "a b a b a" -> bigrams ab,ba,ab,ba -> top 2/4; trigrams
    # aba,bab,aba -> top 2/3. doc1: single word -> no grams.
    codes = np.array([0, 1, 0, 1, 0, 2], dtype=np.int64)
    doc_idx = np.array([0, 0, 0, 0, 0, 1], dtype=np.int64)
    top2 = q._top_gram_frac(codes, doc_idx, 2, 2)
    top3 = q._top_gram_frac(codes, doc_idx, 2, 3)
    assert top2[0] == pytest.approx(0.5)
    assert top3[0] == pytest.approx(2 / 3)
    assert top2[1] == 0.0 and top3[1] == 0.0


# ---------------------------------------------------------------------------
# end-to-end duckdb-twin parity on a handcrafted corpus
# ---------------------------------------------------------------------------

# Duplicates must be GRID-ALIGNED (windows start at k*stride from char
# 0 of each doc — the documented grid approximation of Lee et al.'s
# suffix-array method), so the shared text is a long common PREFIX.
SHARED = (
    "the quick brown fox jumps over the lazy dog while the bright "
    "morning sun climbs slowly above the quiet green valley floor"
)
SHARED_CYR = (
    "бързата кафява лисица прескача мързеливото куче всяка вечер "
    "докато тихата зелена долина спи под ярката пълна луна горе"
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    docs = [
        SHARED + " alpha beta gamma delta epsilon zeta eta theta",
        SHARED + " omega psi chi phi upsilon tau sigma rho pi",
        "spam " * 40,  # degenerate repetition: keep must be False
        "each word here gets used exactly once without any repeats at all "
        "making this rather plain document pass every single repetition "
        "gate cleanly and sail through both bigram plus trigram checks",
        "",  # empty text
        "short doc",  # below window width
        SHARED_CYR + " едно две три четири пет шест седем осем",
        SHARED_CYR + " девет десет единайсет дванайсет тринайсет",
    ]
    d = tmp_path_factory.mktemp("repetition_corpus")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}),
        os.path.join(d, "documents.parquet"),
    )
    return str(d)


def _oracle(corpus_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(corpus_dir, 'documents.parquet')}')"
    )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)[sorted(df.columns)]


def test_gopher_repetition_matches_oracle(ray_session, corpus_dir):
    got = _norm(q.q_gopher_repetition(corpus_dir).to_pandas())
    want = _norm(_oracle(corpus_dir, q.SQL_GOPHER_REPETITION))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    by_id = got.set_index("doc_id")
    assert not by_id.loc[2, "keep"]  # spam*40
    assert by_id.loc[3, "keep"]  # all-distinct doc
    assert by_id.loc[4, "n_words"] == 0 and by_id.loc[4, "keep"]


def test_dedup_substring_matches_oracle(ray_session, corpus_dir):
    got = _norm(q.q_dedup_substring(corpus_dir).to_pandas())
    want = _norm(_oracle(corpus_dir, q.SQL_DEDUP_SUBSTRING))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    hit = set(got["doc_id"])
    # the SHARED English sentence spans docs 0 and 1; the Cyrillic one
    # spans docs 6 and 7 (UTF-32 window path); spam doc 2 self-repeats
    # but shares no window with another doc
    assert {0, 1} <= hit
    assert {6, 7} <= hit
    assert 2 not in hit and 4 not in hit and 5 not in hit


def test_dedup_substring_rm_matches_oracle(ray_session, corpus_dir):
    got = _norm(q.q_dedup_substring_rm(corpus_dir).to_pandas())
    want = _norm(_oracle(corpus_dir, q.SQL_DEDUP_SUBSTRING_RM))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # first-occurrence docs (0 English, 6 Cyrillic) survive untouched;
    # their later twins (1, 7) lose the shared grid-aligned prefix
    assert set(got["doc_id"]) == {1, 7}
    by_id = got.set_index("doc_id")
    assert (by_id["removed_chars"] > 0).all()
    con = duckdb.connect()
    originals = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT doc_id, text FROM "
            f"read_parquet('{os.path.join(corpus_dir, 'documents.parquet')}')"
        ).fetchall()
    }
    for doc_id in (1, 7):
        assert len(by_id.loc[doc_id, "text"]) == len(originals[doc_id]) - int(
            by_id.loc[doc_id, "removed_chars"]
        )
        # the rewritten doc no longer starts with the duplicated prefix
        shared = SHARED if doc_id == 1 else SHARED_CYR
        assert not by_id.loc[doc_id, "text"].startswith(shared[:50])
