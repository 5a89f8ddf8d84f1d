"""More-like-this + streaming match export (engine surfaces layered on
search and the doc store; no reference analog — Lucene ships
MoreLikeThis, and scroll-style full-match export is the bridge from
index to downstream Ray Data pipelines)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.corpus import write_pages
from icat_lucene_ray.index.build import build_index
from icat_lucene_ray.index.modify import IndexUpdater
from icat_lucene_ray.query import And, Filter, Index, MatchAll, Term


@pytest.fixture(scope="module")
def mx_setup(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("mx")
    src = str(d / "docs.parquet")
    texts = [
        "alpha beta gamma alpha",          # 0
        "alpha beta delta",                # 1
        "gamma delta epsilon",             # 2
        "alpha gamma gamma zeta",          # 3
        "unrelated words entirely here",   # 4
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en", "fr", "en", "fr"], pa.string()),
    })
    pq.write_table(tbl, src)
    out = str(d / "idx")
    build_index(src, out, text_col="text", id_col="doc_id",
                meta_cols=["lang"], config=EngineConfig(num_segments=2))
    return Index(out), src


def test_mlt_terms_ranked_by_tf_idf(mx_setup):
    idx, src = mx_setup
    # doc 0: alpha tf=2, beta tf=1, gamma tf=1. df: alpha 3, beta 2,
    # gamma 3 — alpha wins on tf, beta beats gamma on rarity.
    terms = idx.mlt_terms(0, source=src)
    assert terms[0] == "alpha"
    assert set(terms) == {"alpha", "beta", "gamma"}
    assert terms.index("beta") < terms.index("gamma")


def test_mlt_min_doc_freq_prunes_rare_terms(mx_setup):
    idx, src = mx_setup
    # epsilon (df=1) must drop out of doc 2's profile at min_doc_freq=2
    assert "epsilon" in idx.mlt_terms(2, source=src)
    assert "epsilon" not in idx.mlt_terms(2, min_doc_freq=2, source=src)


def test_mlt_excludes_source_and_scores_match_or(mx_setup):
    idx, src = mx_setup
    r = idx.more_like_this(0, k=10, source=src)
    ids = r.table["doc_id"].to_pylist()
    assert 0 not in ids
    assert set(ids) == {1, 2, 3}  # doc 4 shares no term
    # hits equal an explicit OR over the selected terms minus the doc
    from icat_lucene_ray.query import Or

    ref = idx.search(Or([Term(t) for t in idx.mlt_terms(0, source=src)]),
                     k=10)
    by_id = dict(zip(ref.table["doc_id"].to_pylist(),
                     ref.table["score"].to_pylist()))
    for i, s in zip(ids, r.table["score"].to_pylist()):
        assert s == pytest.approx(by_id[i])


def test_mlt_max_query_terms_caps_profile(mx_setup):
    idx, src = mx_setup
    assert len(idx.mlt_terms(0, max_query_terms=1, source=src)) == 1


def test_mlt_stored_term_vectors_match_text_reanalysis(mx_setup,
                                                       monkeypatch):
    idx, src = mx_setup
    stored = idx.mlt_terms(0)  # (terms, tfs) path — no source needed
    monkeypatch.setattr(type(idx), "_stored_term_freqs",
                        lambda self, d: None)
    assert idx.mlt_terms(0, source=src) == stored


def test_df_lookup_matches_term_df(mx_setup):
    idx, _src = mx_setup
    stems = ["alpha", "beta", "gamma", "delta", "epsilon", "absent"]
    got = idx._df_lookup(stems)
    assert got.tolist() == [idx.term_df(s) for s in stems]
    assert got[-1] == 0


def test_export_term_query_matches_search_ids(mx_setup):
    idx, _src = mx_setup
    ds = idx.matches_dataset(Term("gamma"), columns=["lang"],
                             with_score=True)
    t = ds.take_all()
    ids = sorted(r["doc_id"] for r in t)
    assert ids == [0, 2, 3]
    # scores equal the search path's BM25 for the same docs
    r = idx.search(Term("gamma"), k=10)
    by_id = dict(zip(r.table["doc_id"].to_pylist(),
                     r.table["score"].to_pylist()))
    for row in t:
        assert row["score"] == pytest.approx(by_id[row["doc_id"]])
        assert row["lang"] in ("en", "fr")


def test_export_filter_pushdown_never_touches_index(mx_setup):
    idx, _src = mx_setup
    # pure predicate: expression pushdown path (no _eval)
    ds = idx.matches_dataset(Filter("lang", "fr"))
    ids = sorted(r["doc_id"] for r in ds.take_all())
    assert ids == [2, 4]
    # conjunction of predicates composes into one expression
    ds2 = idx.matches_dataset(And([Filter("lang", "en"),
                                   MatchAll()]), with_score=True)
    rows = ds2.take_all()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 3]
    assert {r["score"] for r in rows} == {1.0}  # constant-score filters


def test_export_empty_match_keeps_schema(mx_setup):
    idx, _src = mx_setup
    ds = idx.matches_dataset(Term("nosuchterm"), columns=["lang"],
                             with_score=True)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"doc_id", "lang", "score"}


def test_export_unknown_column_raises(mx_setup):
    idx, _src = mx_setup
    with pytest.raises(ValueError, match="not stored"):
        idx.matches_dataset(Term("gamma"), columns=["nope"])


def test_export_respects_tombstones_and_updates(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(pages, 80, rows_per_file=40, vocab_size=300)
    out = str(tmp_path / "idx")
    build_index(pages, out, meta_cols=["lang"],
                config=EngineConfig(num_segments=2))
    idx0 = Index(out)
    victims = idx0.search(MatchAll(), k=2).table["doc_id"].to_pylist()
    up = IndexUpdater(out)
    up.delete(victims[0])
    up.update({"doc_id": victims[1], "url": "https://x.test/upd",
               "text": "xenon xenon argon", "lang": "en"})
    up.commit()
    idx = Index(out)
    rows = idx.matches_dataset(MatchAll()).take_all()
    ids = [r["doc_id"] for r in rows]
    assert victims[0] not in ids          # tombstoned
    assert ids.count(victims[1]) == 1     # updated doc appears ONCE
    assert len(ids) == idx.live_count()
    got = idx.matches_dataset(Term("xenon")).take_all()
    assert [r["doc_id"] for r in got] == [victims[1]]
