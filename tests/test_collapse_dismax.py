"""minimumNumberShouldMatch, DisjunctionMaxQuery, and field collapsing
(Lucene BooleanQuery.Builder.setMinimumNumberShouldMatch /
DisjunctionMaxQuery / grouping-module CollapsingTopDocsCollector
analogs) — rank identity vs the brute-force oracle, plus delete
visibility through the collapse path."""

import pytest

from icat_lucene_ray.query import (
    DisMax, Filter, Index, MatchAll, Or, Term,
)


def _terms_by_df(oracle):
    dfs = sorted(((len(p), t) for t, p in oracle.postings.items()),
                 reverse=True)
    head = dfs[0][1]
    mid = [t for df, t in dfs if 20 < df < 80][:4]
    return head, mid


def _assert_rank(engine, oracle, q, k=10):
    r = engine.search(q, k=k)
    e = oracle.search(q, k=k)
    got = list(zip(r.table["doc_id"].to_pylist(),
                   r.table["score"].to_pylist()))
    assert [g[0] for g in got] == [x[0] for x in e], (got[:5], e[:5])
    for g, x in zip(got, e):
        assert abs(g[1] - x[1]) <= 1e-9 * max(1.0, abs(x[1]))
    assert r.total_hits == oracle.count(q)


# ---------------- minimumNumberShouldMatch -----------------------------

def test_min_should_match_rank_identity(engine, oracle):
    head, mid = _terms_by_df(oracle)
    q = Or([Term(head), Term(mid[0]), Term(mid[1])], min_should=2)
    _assert_rank(engine, oracle, q, k=20)


def test_min_should_subsets_plain_or(engine, oracle):
    head, mid = _terms_by_df(oracle)
    clauses = [Term(head), Term(mid[0]), Term(mid[1])]
    n1 = engine.count(Or(clauses))
    n2 = engine.count(Or(clauses, min_should=2))
    n3 = engine.count(Or(clauses, min_should=3))
    assert n1 >= n2 >= n3
    # m = len(clauses): same doc set as the conjunction
    from icat_lucene_ray.query import And

    assert n3 == engine.count(And(clauses))


def test_min_should_above_clause_count_is_empty(engine):
    q = Or([Term("the")], min_should=2)
    assert engine.count(q) == 0


def test_min_should_validation():
    with pytest.raises(ValueError):
        Or([Term("a")], min_should=0)


def test_min_should_counts_filter_clauses(engine, oracle):
    head, _ = _terms_by_df(oracle)
    q = Or([Term(head), Filter("lang", "en")], min_should=2)
    _assert_rank(engine, oracle, q, k=20)


# ---------------- DisjunctionMaxQuery ----------------------------------

def test_dismax_rank_identity(engine, oracle):
    head, mid = _terms_by_df(oracle)
    for tie in (0.0, 0.3, 1.0):
        _assert_rank(engine, oracle,
                     DisMax([Term(head), Term(mid[0])], tie=tie), k=20)


def test_dismax_tie1_equals_or_sum(engine, oracle):
    head, mid = _terms_by_df(oracle)
    clauses = [Term(head), Term(mid[0])]
    a = engine.search(DisMax(clauses, tie=1.0), k=15)
    b = engine.search(Or(clauses), k=15)
    assert a.table["doc_id"].to_pylist() == b.table["doc_id"].to_pylist()
    for x, y in zip(a.table["score"].to_pylist(),
                    b.table["score"].to_pylist()):
        assert abs(x - y) <= 1e-12 * max(1.0, abs(y))


def test_dismax_validation():
    with pytest.raises(ValueError):
        DisMax([Term("a")], tie=1.5)


# ---------------- field collapsing --------------------------------------

def _assert_collapse(engine, oracle, q, dim, k=10):
    r = engine.search(q, k=k, collapse=dim)
    e = oracle.collapse_search(q, dim, k=k)
    got = list(zip(r.table["doc_id"].to_pylist(),
                   r.table["score"].to_pylist(),
                   r.table[dim].to_pylist()))
    assert [(g[0], g[2]) for g in got] == [(x[0], x[2]) for x in e], \
        (got[:5], e[:5])
    for g, x in zip(got, e):
        assert abs(g[1] - x[1]) <= 1e-9 * max(1.0, abs(x[1]))
    assert r.total_hits == oracle.count(q)
    # one hit per key, by construction
    assert len({g[2] for g in got}) == len(got)
    return r


def test_collapse_rank_identity(engine, oracle):
    head, mid = _terms_by_df(oracle)
    _assert_collapse(engine, oracle, Term(head), "lang")
    _assert_collapse(engine, oracle, Or([Term(mid[0]), Term(mid[1])]),
                     "lang")


def test_collapse_match_all(engine, oracle):
    r = _assert_collapse(engine, oracle, MatchAll(), "lang", k=50)
    # every lang present exactly once; score 1.0 means doc_id-asc winner
    assert r.table.num_rows == len({v for v in oracle.meta["lang"]
                                    if v is not None})


def test_collapse_high_cardinality_key(engine, oracle):
    # collapse on a near-unique key: champions ~= the plain top-k
    head, _ = _terms_by_df(oracle)
    _assert_collapse(engine, oracle, Term(head), "warc_ts", k=10)


def test_collapse_search_after_pages(engine, oracle):
    head, _ = _terms_by_df(oracle)
    full = oracle.collapse_search(Term(head), "lang", k=100)
    r1 = engine.search(Term(head), k=2, collapse="lang")
    r2 = engine.search(Term(head), k=100, collapse="lang",
                       search_after=r1.search_after)
    ids = (r1.table["doc_id"].to_pylist() + r2.table["doc_id"].to_pylist())
    assert ids == [x[0] for x in full]


def test_collapse_empty_and_sort_conflict(engine):
    r = engine.search(Term("zz-no-such-term-zz"), k=5, collapse="lang")
    assert r.table.num_rows == 0
    assert r.table.column_names[:3] == ["doc_id", "score", "lang"]
    with pytest.raises(ValueError):
        engine.search(Term("the"), k=5, collapse="lang",
                      sort=[("lang", False)])


def test_collapse_sees_deletes_and_deltas(ray_session, tmp_path):
    """Tombstoned champion must yield to the runner-up, and a committed
    delta doc must be collapsible — exercises the base-fragment AND
    inline-delta legs of _search_collapsed."""
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.corpus import write_pages
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.index.modify import IndexUpdater

    pages = str(tmp_path / "pages")
    write_pages(pages, 120, rows_per_file=60, vocab_size=800)
    out = str(tmp_path / "idx")
    build_index(pages, out, meta_cols=["lang"], config=EngineConfig(
        num_segments=4))
    idx = Index(out)
    before = idx.search(MatchAll(), k=50, collapse="lang")
    champ_id = int(before.table["doc_id"][0].as_py())
    champ_lang = before.table["lang"][0].as_py()

    up = IndexUpdater(out)
    up.delete(champ_id)
    up.create({"url": "https://x.test/delta1",
               "text": "zanzibar collapse probe", "lang": "xx"})
    up.commit()

    idx2 = Index(out)
    after = idx2.search(MatchAll(), k=50, collapse="lang")
    ids = after.table["doc_id"].to_pylist()
    langs = after.table["lang"].to_pylist()
    assert champ_id not in ids
    assert champ_lang in langs            # runner-up took the key
    assert "xx" in langs                  # delta doc collapsible
    assert len(set(langs)) == len(langs)


# ---------------- stats metrics aggregation -----------------------------

def test_aggregate_stats_matches_brute_force(engine, oracle):
    import numpy as np

    head, mid = _terms_by_df(oracle)
    for q in (Term(head), Or([Term(mid[0]), Term(mid[1])]), MatchAll()):
        s = engine.aggregate_stats(q, "warc_ts")
        m, _ = oracle._eval(q)
        # timestamps aggregate as epoch floats in the column's storage
        # unit (timestamp[us] here) — ES date-stats analog
        vals = np.array(
            [v for d, v in zip(oracle.doc_ids, oracle.meta["warc_ts"])
             if int(d) in m and v is not None],
            dtype="datetime64[us]").astype(np.int64).astype(np.float64)
        assert s["count"] == len(vals)
        assert abs(s["sum"] - vals.sum()) <= 1e-6 * max(1.0,
                                                        abs(vals.sum()))
        assert s["min"] == vals.min()
        assert s["max"] == vals.max()
        assert abs(s["mean"] - vals.mean()) <= 1e-9 * max(
            1.0, abs(vals.mean()))


def test_aggregate_stats_empty_match(engine):
    s = engine.aggregate_stats(Term("zz-no-such-term-zz"), "warc_ts")
    assert s == {"count": 0, "sum": None, "min": None, "max": None,
                 "mean": None}


def test_aggregate_stats_sees_deletes(ray_session, tmp_path):
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.corpus import write_pages
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.index.modify import IndexUpdater

    pages = str(tmp_path / "pages")
    write_pages(pages, 80, rows_per_file=40, vocab_size=500)
    out = str(tmp_path / "idx")
    build_index(pages, out, meta_cols=["lang", "warc_ts"],
                config=EngineConfig(num_segments=2))
    idx = Index(out)
    before = idx.aggregate_stats(MatchAll(), "warc_ts")
    victim = int(idx.search(MatchAll(), k=1).table["doc_id"][0].as_py())
    v_ts = idx.search(MatchAll(), k=1,
                      fields=["warc_ts"]).table["warc_ts"][0].as_py()
    up = IndexUpdater(out)
    up.delete(victim)
    up.commit()
    after = Index(out).aggregate_stats(MatchAll(), "warc_ts")
    assert after["count"] == before["count"] - 1
    import numpy as np

    v_us = float(np.datetime64(v_ts, "us").astype(np.int64))
    assert abs((before["sum"] - after["sum"]) - v_us) <= 1e-6 * max(
        1.0, abs(v_us))


def test_histogram_matches_brute_force(engine, oracle):
    import numpy as np

    head, _ = _terms_by_df(oracle)
    for q in (Term(head), MatchAll()):
        # hour-interval histogram over the timestamp column (epoch-us)
        t = engine.histogram(q, "warc_ts", 3_600e6)
        m, _ = oracle._eval(q)
        vals = np.array(
            [v for d, v in zip(oracle.doc_ids, oracle.meta["warc_ts"])
             if int(d) in m and v is not None],
            dtype="datetime64[us]").astype(np.int64).astype(np.float64)
        b = np.floor(vals / 3_600e6)
        ks, cnt = np.unique(b, return_counts=True)
        assert t["bucket"].to_pylist() == (ks * 3_600e6).tolist()
        assert t["count"].to_pylist() == cnt.tolist()
        assert int(np.sum(cnt)) == len(vals)


def test_histogram_empty_and_validation(engine):
    t = engine.histogram(Term("zz-no-such-term-zz"), "warc_ts", 10.0)
    assert t.num_rows == 0
    with pytest.raises(ValueError):
        engine.histogram(MatchAll(), "warc_ts", 0.0)


def test_inline_vs_fragment_paths_agree(engine, oracle, monkeypatch):
    """The small-candidate inline shortcut and the fragment fan-out must
    produce identical collapse / stats / histogram results."""
    import icat_lucene_ray.query.engine as eng

    head, _ = _terms_by_df(oracle)
    q = Term(head)
    r_inline = engine.search(q, k=10, collapse="lang")
    s_inline = engine.aggregate_stats(q, "warc_ts")
    h_inline = engine.histogram(q, "warc_ts", 3_600e6)
    monkeypatch.setattr(eng, "_AGG_INLINE_MAX", 0)
    r_frag = engine.search(q, k=10, collapse="lang")
    s_frag = engine.aggregate_stats(q, "warc_ts")
    h_frag = engine.histogram(q, "warc_ts", 3_600e6)
    assert r_inline.table.equals(r_frag.table)
    assert s_inline == s_frag
    assert h_inline.equals(h_frag)
