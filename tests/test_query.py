"""Rank-identity vs the brute-force oracle — the reference query set
(FIXTURES.md §3): docIDs identical, scores within 1e-9 relative."""

import numpy as np
import pytest

from icat_lucene_ray.query import (
    And, Filter, MatchAll, Not, Or, Phrase, RangeFilter, Term, Wildcard,
)


def _terms_by_df(oracle):
    dfs = sorted(((len(p), t) for t, p in oracle.postings.items()), reverse=True)
    head = dfs[0][1]
    mid = [t for df, t in dfs if 20 < df < 80][:4]
    rare = [t for df, t in dfs if df == 2][:2]
    return head, mid, rare


def assert_rank_identical(engine, oracle, q, k=10, search_after=None):
    r = engine.search(q, k=k, search_after=search_after)
    e = oracle.search(q, k=k, search_after=search_after)
    got = list(zip(r.table["doc_id"].to_pylist(), r.table["score"].to_pylist()))
    assert [g[0] for g in got] == [x[0] for x in e], (got[:5], e[:5])
    for g, x in zip(got, e):
        assert abs(g[1] - x[1]) <= 1e-9 * max(1.0, abs(x[1]))
    assert r.total_hits == oracle.count(q)
    return r


def test_term_queries(engine, oracle):
    head, mid, rare = _terms_by_df(oracle)
    for t in [head] + mid + rare:
        assert_rank_identical(engine, oracle, Term(t), k=10)


def test_head_term_k100(engine, oracle):
    head, _, _ = _terms_by_df(oracle)
    assert_rank_identical(engine, oracle, Term(head), k=100)


def test_and(engine, oracle):
    _, mid, _ = _terms_by_df(oracle)
    assert_rank_identical(engine, oracle, And([Term(mid[0]), Term(mid[1])]))
    assert_rank_identical(
        engine, oracle, And([Term(mid[0]), Term(mid[1]), Term(mid[2])]))


def test_or(engine, oracle):
    _, mid, rare = _terms_by_df(oracle)
    assert_rank_identical(
        engine, oracle, Or([Term(mid[0]), Term(mid[1]), Term(rare[0])]))


def test_mixed_bool(engine, oracle):
    head, mid, _ = _terms_by_df(oracle)
    q = Not(And([Term(head), Term(mid[0])]), Term(mid[1]))
    assert_rank_identical(engine, oracle, q)


def test_filter_plus_text(engine, oracle):
    _, mid, _ = _terms_by_df(oracle)
    q = And([Term(mid[0])], filters=[Filter("lang", "en")])
    assert_rank_identical(engine, oracle, q)


def test_filter_only_conjunction(engine, oracle):
    """Occur.FILTER-only tree (no scoring clause) — ADVICE regression:
    And([], filters=[...]) must seed candidates from the first filter."""
    q = And([], filters=[Filter("lang", "en")])
    assert_rank_identical(engine, oracle, q)
    q2 = And([], filters=[Filter("lang", ("en", "de")), Filter("lang", "en")])
    assert engine.count(q2) == oracle.count(q2)


def test_match_all(engine, oracle):
    r = assert_rank_identical(engine, oracle, MatchAll(), k=10)
    assert r.total_hits == oracle.N


def test_phrase_lite(engine, oracle):
    _, mid, _ = _terms_by_df(oracle)
    assert_rank_identical(engine, oracle, Phrase([mid[0], mid[1]]))


def test_wildcard(engine, oracle):
    _, mid, _ = _terms_by_df(oracle)
    assert_rank_identical(engine, oracle, Wildcard(mid[0][:2] + "*"))


def test_wildcard_mixed_case_lowercased(engine, oracle):
    # M11 (SearchBucket.java:171-194): wildcard terms lowercased at parse
    _, mid, _ = _terms_by_df(oracle)
    pat = mid[0][:2].upper() + "*"
    assert engine.expand_wildcard(pat) == engine.expand_wildcard(pat.lower())


def test_range_filter(engine, oracle):
    q = And([MatchAll()], filters=[RangeFilter("doc_len", lo=100, hi=400)])
    r = engine.search(q, k=5)
    expected = sum(1 for v in oracle.doc_len.values() if 100 <= v <= 400)
    assert r.total_hits == expected


def test_search_after_pages(engine, oracle):
    head, mid, _ = _terms_by_df(oracle)
    for q in [Term(head), Or([Term(mid[0]), Term(mid[1])])]:
        cursor = None
        seen = []
        for _page in range(3):
            r = assert_rank_identical(engine, oracle, q, k=10,
                                      search_after=cursor)
            ids = r.table["doc_id"].to_pylist()
            if not ids:
                break
            assert not (set(seen) & set(ids)), "pages must not overlap"
            seen += ids
            cursor = r.search_after


def test_empty_in_list_matches_none(engine):
    # SearchBucket.java:830 — empty IN-list => MatchNoDocs
    q = And([MatchAll()], filters=[Filter("lang", [])])
    assert engine.search(q, k=5).total_hits == 0


def test_stopword_query_matches_none(engine):
    assert engine.search(Term("the"), k=5).total_hits == 0


def test_facets(engine, oracle):
    head, _, _ = _terms_by_df(oracle)
    f = engine.facets(Term(head), dims=["lang"])
    assert f["lang"] == dict(
        sorted(oracle.facet(Term(head), "lang").items(),
               key=lambda kv: (-kv[1], kv[0]))
    )


def test_sparse_facets_all_dims(engine):
    # A2: no dims given -> facet every string meta column
    f = engine.facets(MatchAll())
    assert "lang" in f and "url" in f


def test_range_facets(engine, oracle):
    ranges = {"doc_len": [("short", 0, 100), ("mid", 100, 500),
                          ("long", 500, 3000)]}
    f = engine.facets(MatchAll(), dims=[], ranges=ranges)
    truth = {"short": 0, "mid": 0, "long": 0}
    for v in oracle.doc_len.values():
        if v < 100:
            truth["short"] += 1
        elif v < 500:
            truth["mid"] += 1
        else:
            truth["long"] += 1
    got = {k: v["doc_count"] for k, v in f["doc_len"].items()}
    assert got == truth


def test_field_sorted_topk(engine, oracle):
    r = engine.search(MatchAll(), k=7, sort=[("warc_ts", True)],
                      fields=["url"])
    # truth: warc_ts desc, doc_id asc
    metas = sorted(
        zip(oracle.meta["warc_ts"], oracle.doc_ids),
        key=lambda x: (-x[0].timestamp(), x[1]) if hasattr(x[0], "timestamp")
        else (-x[0], x[1]),
    )
    assert r.table["doc_id"].to_pylist() == [int(d) for _, d in metas[:7]]
    # page 2 continues without overlap
    r2 = engine.search(MatchAll(), k=7, sort=[("warc_ts", True)],
                       search_after=r.search_after)
    assert r2.table["doc_id"].to_pylist() == [int(d) for _, d in metas[7:14]]


def test_stored_fields_attached(engine):
    r = engine.search(MatchAll(), k=3, fields=["url", "lang"])
    assert r.table.column_names[:2] == ["doc_id", "score"]
    assert all(u.startswith("https://") for u in r.table["url"].to_pylist())


def test_actor_pool_mode(ray_session, built_index, oracle):
    from icat_lucene_ray.query import Index

    eng = Index(built_index.root, use_actors=True, num_actors=2)
    head, mid, _ = _terms_by_df(oracle)
    for q in [Term(head), And([Term(mid[0]), Term(mid[1])])]:
        assert_rank_identical(eng, oracle, q, k=20)


def test_timeout_guard(engine):
    from icat_lucene_ray.query.engine import SearchTimeout

    with pytest.raises(SearchTimeout):
        engine.search(MatchAll(), k=5, timeout=-1.0)


def test_field_sorted_never_materializes_candidates(engine, monkeypatch):
    """K3 regression: the sort path must fetch at most k rows from the
    doc store on the driver (per-fragment top-k + k-way merge), never
    the full candidate key set."""
    from icat_lucene_ray.query.engine import Index as _I

    seen = []
    orig = _I._fetch_doc_rows

    def spy(self, ids, columns):
        seen.append(len(ids))
        return orig(self, ids, columns)

    monkeypatch.setattr(_I, "_fetch_doc_rows", spy)
    r = engine.search(MatchAll(), k=7, sort=[("warc_ts", True)])
    assert len(r.table) == 7
    assert seen and max(seen) <= 7


def test_meta_field_term_routes_to_filter(engine, oracle):
    """field:term on a stored META column is an exact non-scoring
    filter (reference StringField semantics); before the rewrite a
    single-field index silently dropped the field name and searched
    the text. Unknown fields raise on every search path."""
    from icat_lucene_ray.query import parse_query

    q = parse_query("lang:en")
    r = engine.search(q, k=5)
    assert engine.count(q) == r.total_hits
    # restriction composes with scoring clauses
    head, mid, rare = _terms_by_df(oracle)
    both = engine.search(parse_query(f"lang:en AND {mid[0]}"), k=50)
    solo = engine.search(Term(mid[0]), k=50)
    assert both.total_hits <= solo.total_hits
    import pytest as _pytest

    for bad in ("bogus:x", "bogus:[1 TO 2]"):
        with _pytest.raises(ValueError):
            engine.search(parse_query(bad), k=5)


def test_meta_field_expansion_queries(engine, oracle):
    """Wildcard/regexp/fuzzy on a META column expand against the
    column's distinct values (the StringField's own "term dictionary",
    like Lucene) into exact filters — previously they searched the
    TEXT dictionary and silently matched nothing."""
    from icat_lucene_ray.query import parse_query
    from icat_lucene_ray.query.ast import Fuzzy, Regexp

    langs = sorted({v for v in oracle.meta["lang"] if v is not None})
    assert len(langs) >= 2
    some = langs[:2]
    # regexp alternation over meta values == union of exact filters
    q = Regexp("|".join(some), field="lang")
    assert engine.count(q) == sum(
        engine.count(Filter("lang", v)) for v in some)
    assert_rank_identical(engine, oracle, q)
    # wildcard: first-char prefix
    assert_rank_identical(engine, oracle,
                          Wildcard(some[0][0] + "*", field="lang"))
    # fuzzy: one edit away from a real value matches at least it
    probe = some[0] + "x"
    assert_rank_identical(engine, oracle, Fuzzy(probe, 1, field="lang"))
    assert engine.count(Fuzzy(probe, 1, field="lang")) \
        >= engine.count(Filter("lang", some[0]))
    # the parser surface reaches the same route
    assert engine.count(parse_query(f"lang:/{'|'.join(some)}/")) \
        == engine.count(q)
    # no matching value -> empty IN-list (MatchNone), not an error
    assert engine.count(Regexp("zz+", field="lang")) == 0


def test_weight_over_filter_scores_factor(engine, oracle):
    """ADVICE regression: a boost on a non-scoring clause (Filter /
    RangeFilter / MatchAll) must materialize factor-per-match constant
    scores — Lucene's BoostQuery over a ConstantScoreQuery — instead of
    being silently dropped to 1.0 by Or()'s ones substitution."""
    from icat_lucene_ray.query.ast import Weight

    r = engine.search(Weight(Filter("lang", "en"), 3.0), k=5)
    scores = r.table["score"].to_pylist()
    assert scores and all(abs(s - 3.0) < 1e-12 for s in scores)

    # inside an OR: the filter clause contributes its factor to the sum
    _, mid, _ = _terms_by_df(oracle)
    base = engine.search(Or([Filter("lang", "en"), Term(mid[0])]), k=10)
    boosted = engine.search(
        Or([Weight(Filter("lang", "en"), 2.0), Term(mid[0])]), k=10)
    b_by_id = dict(zip(boosted.table["doc_id"].to_pylist(),
                       boosted.table["score"].to_pylist()))
    u_by_id = dict(zip(base.table["doc_id"].to_pylist(),
                       base.table["score"].to_pylist()))
    common = set(b_by_id) & set(u_by_id)
    assert common
    # every common doc gains exactly +1.0 (2.0 vs the unboosted 1.0)
    for d in common:
        assert abs((b_by_id[d] - u_by_id[d]) - 1.0) < 1e-9


def test_regexp_query(engine, oracle):
    """Q5bis: /pattern/ full-match dictionary expansion, OR-sum scored
    — rank-identical to the brute-force oracle, and equal to the
    equivalent wildcard where the languages coincide."""
    from icat_lucene_ray.query.ast import Regexp

    assert_rank_identical(engine, oracle, Regexp("jo.*"))
    assert_rank_identical(engine, oracle, Regexp("(dat|merg)[a-z]*"))
    # UNPARENTHESIZED top-level alternation: the leading literal of the
    # first branch must not prune away the other branches
    assert_rank_identical(engine, oracle, Regexp("dat[a-z]*|merg[a-z]*"))
    assert set(engine.expand_regexp("jo.*|dat.*")) \
        == set(engine.expand_wildcard("jo*")) \
        | set(engine.expand_wildcard("dat*"))
    # uppercase escape classes survive M11 lowercasing (`\S` must NOT
    # become `\s`): terms contain no whitespace, so jo\S* == jo*
    assert set(engine.expand_regexp("jo\\S*")) \
        == set(engine.expand_wildcard("jo*"))
    # full-match anchoring: a bare fragment matches nothing extra
    assert engine.expand_regexp("jo.*") == engine.expand_wildcard("jo*")
    assert engine.expand_regexp("o") == []  # 'o' alone full-matches no term


def test_regexp_query_string_syntax(engine, oracle):
    from icat_lucene_ray.query import parse_query

    q = parse_query("/jo.*/")
    assert_rank_identical(engine, oracle, q)


def test_fuzzy_wildcard_cache_equals_scan(engine):
    """The in-memory dictionary cache (pruned column-DP / in-RAM match)
    must produce exactly the candidate sets of the streaming parquet
    scan, across edit distances, wildcards and regexps."""
    import dataclasses

    from icat_lucene_ray.query import Index

    scan_engine = Index(engine.manifest.root)
    # force the streaming path on the comparison engine
    scan_engine.cfg = dataclasses.replace(scan_engine.cfg,
                                          term_dict_cache_max=0)
    assert scan_engine._term_cache() is None
    assert engine._term_cache() is not None

    terms = list(engine._term_cache()[0])
    probes = []
    for t in terms[:: max(1, len(terms) // 12)]:
        probes.append(t)                      # exact (distance 0)
        probes.append(t[:-1] + "x")           # substitution typo
        probes.append(t + "q")                # insertion typo
        if len(t) > 2:
            probes.append(t[1:])              # deletion typo
    for q in probes:
        for e in (0, 1, 2):
            a = set(engine.expand_fuzzy(q, e))
            b = set(scan_engine.expand_fuzzy(q, e))
            assert a == b, (q, e, a ^ b)
    cap = engine.cfg.max_wildcard_terms
    for pat in ["jo*", "*in", "d?ta", "*", "zz*"]:
        a, b = engine.expand_wildcard(pat), scan_engine.expand_wildcard(pat)
        if len(a) >= cap or len(b) >= cap:
            # above the expansion cap the 1024-term SUBSET is
            # order-dependent (sorted vs scan order) — only the cap
            # itself is contractual
            assert len(a) == len(b) == cap, pat
        else:
            assert set(a) == set(b), pat
    for rx in ["jo.*", "(dat|merg)[a-z]*", "jo.*|dat.*", ".", "x+"]:
        assert set(engine.expand_regexp(rx)) \
            == set(scan_engine.expand_regexp(rx)), rx


def test_term_codes_byte_guard(engine, monkeypatch):
    """Above the code-matrix byte cap the cache keeps the sorted terms
    (wildcard/regexp stay in-memory) but fuzzy falls back to the
    streaming scan with identical candidates — the guard exists because
    the padded matrix is T × the single LONGEST term, so one
    pathological token must not OOM the actor."""
    from icat_lucene_ray.query import Index
    from icat_lucene_ray.query import engine as eng_mod

    monkeypatch.setattr(eng_mod, "_TERM_CODES_MAX_BYTES", 0)
    guarded = Index(engine.manifest.root)
    cache = guarded._term_cache()
    assert cache is not None and cache[2] is None
    probe = str(engine._term_cache()[0][0])
    assert set(guarded.expand_fuzzy(probe, 1)) \
        == set(engine.expand_fuzzy(probe, 1))
    assert guarded.expand_wildcard("jo*") == engine.expand_wildcard("jo*")
