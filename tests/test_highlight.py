"""Highlight fragments + spell suggestions (engine user surfaces layered
on search / the term dictionary; no reference analog — Lucene offers
UnifiedHighlighter / DirectSpellChecker beside the operators the
reference wraps, and a user switching engines expects both)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def hl_setup(ray_session, tmp_path_factory):
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.query import Index

    d = tmp_path_factory.mktemp("hl")
    src = str(d / "docs.parquet")
    texts = [
        # anchor at token 0, second match inside the window
        "data starts then more data here and data again at the end",
        # single match mid-document
        "alpha beta gamma delta jumps epsilon zeta eta theta",
        # no query term at all
        "omicron pi rho sigma tau",
        # surface differs from the query term but stems agree (jump)
        "the system keeps jumping between nodes",
        # vocabulary for suggest(): date/gate near 'data'
        "date gate date late date gate",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, src)
    out = str(d / "idx")
    build_index(src, out, text_col="text", id_col="doc_id",
                meta_cols=["lang"], config=EngineConfig(num_segments=2))
    return Index(out), src


def test_highlight_window_and_wrap_all_in_window(hl_setup):
    from icat_lucene_ray.query import Term

    idx, src = hl_setup
    t = idx.highlight(Term("data"), k=10, window=3, source=src)
    by_id = dict(zip(t["doc_id"].to_pylist(), t["snippet"].to_pylist()))
    # doc 0: anchor at token 0 (window truncated left); the second match
    # at token 4 sits outside the +3 window
    assert by_id[0] == "<em>data</em> starts then more"
    # widen the window: the second match (token 4) is now wrapped too,
    # the third (token 7) still is not
    t = idx.highlight(Term("data"), k=10, window=4, source=src)
    by_id = dict(zip(t["doc_id"].to_pylist(), t["snippet"].to_pylist()))
    assert by_id[0] == "<em>data</em> starts then more <em>data</em>"


def test_highlight_stemmed_match(hl_setup):
    from icat_lucene_ray.query import Term

    idx, src = hl_setup
    # query 'jumps' stems to 'jump'; doc 3 carries 'jumping' (same stem)
    t = idx.highlight(Term("jumps"), k=10, window=2, source=src)
    by_id = dict(zip(t["doc_id"].to_pylist(), t["snippet"].to_pylist()))
    assert by_id[3] == "system keeps <em>jumping</em> between nodes"
    assert by_id[1] == "gamma delta <em>jumps</em> epsilon zeta"


def test_highlight_filter_only_hits_get_empty_snippet(hl_setup):
    from icat_lucene_ray.query import Filter

    idx, src = hl_setup
    t = idx.highlight(Filter("lang", "en"), k=10, source=src)
    assert t.num_rows == 5
    assert set(t["snippet"].to_pylist()) == {""}


def test_highlight_requires_source_when_text_not_stored(hl_setup):
    from icat_lucene_ray.query import Term

    idx, _src = hl_setup
    with pytest.raises(ValueError, match="not stored"):
        idx.highlight(Term("data"), k=5)


def test_highlight_custom_markers(hl_setup):
    from icat_lucene_ray.query import Term

    idx, src = hl_setup
    t = idx.highlight(Term("gamma"), k=10, window=1, source=src,
                      pre="**", post="**")
    assert t["snippet"].to_pylist() == ["beta **gamma** delta"]


def test_suggest_ranking_and_exact_exclusion(hl_setup):
    idx, _src = hl_setup
    s = idx.suggest("data", k=5, max_edits=1)
    rows = list(zip(s["term"].to_pylist(), s["dist"].to_pylist(),
                    s["df"].to_pylist()))
    # 'data' itself (dist 0) is excluded; 'date' (df=1 doc) and 'gate'
    # (dist 2 from 'data') — only 'date' sits at edit distance 1
    assert ("data", 0, 3) not in rows
    assert rows and rows[0][0] == "date" and rows[0][1] == 1


def test_suggest_df_then_term_tiebreak(hl_setup):
    idx, _src = hl_setup
    s = idx.suggest("gata", k=5, max_edits=1)
    # dist-1 candidates: 'data' (df 3 docs? -> df over docs) vs 'gate'
    # (df 1): higher df first
    terms = s["term"].to_pylist()
    dists = s["dist"].to_pylist()
    assert terms[0] == "data" and dists == sorted(dists)
    assert "gate" in terms


def test_suggest_empty_when_nothing_close(hl_setup):
    idx, _src = hl_setup
    s = idx.suggest("qqqqqqqq", k=5, max_edits=2)
    assert s.num_rows == 0
