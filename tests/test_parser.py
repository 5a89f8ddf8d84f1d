"""Query-string parser golden tests (Q2) — mirrors the reference's
parse tests (``TestLucene.java:354-360``-style: input string → expected
query tree) plus rank-identity of parsed queries vs the oracle."""

import pytest

from icat_lucene_ray.query import (
    And, Boost, MatchAll, Not, Or, Phrase, Term, Wildcard, parse_query,
)
from icat_lucene_ray.query.parser import QueryParseError

from tests.test_query import _terms_by_df, assert_rank_identical


def test_single_term():
    assert parse_query("data") == Term("data")


def test_adjacency_is_or():
    # Lucene default operator (StandardQueryParser) is OR
    assert parse_query("data join") == Or([Term("data"), Term("join")])


def test_explicit_and():
    assert parse_query("data AND join") == And([Term("data"), Term("join")])


def test_and_binds_tighter_than_or():
    assert parse_query("a AND b OR c") == Or([And([Term("a"), Term("b")]),
                                              Term("c")])
    assert parse_query("a OR b AND c") == Or([Term("a"),
                                              And([Term("b"), Term("c")])])


def test_parens():
    assert parse_query("a AND (b OR c)") == And(
        [Term("a"), Or([Term("b"), Term("c")])])


def test_must_plus_should_is_boost():
    # '+data join': data required, join only boosts (Lucene MUST+SHOULD)
    assert parse_query("+data join") == Boost(Term("data"), Term("join"))


def test_negation_forms():
    assert parse_query("data -spark") == Not(Term("data"), Term("spark"))
    assert parse_query("data NOT spark") == Not(Term("data"), Term("spark"))
    assert parse_query("NOT spark") == Not(MatchAll(), Term("spark"))
    assert parse_query("a AND NOT b") == Not(Term("a"), Term("b"))


def test_field_scoping():
    assert parse_query("title:window") == Term("window", field="title")
    assert parse_query("title:(a b)") == Or(
        [Term("a", field="title"), Term("b", field="title")])
    assert parse_query('title:"fast join"') == Phrase(
        ["fast", "join"], field="title")


def test_multi_default_fields():
    got = parse_query("window", default_fields=["title", "text"])
    assert got == Or([Term("window", "title"), Term("window", "text")])
    # explicit field overrides the default list
    assert parse_query("text:window", default_fields=["title", "text"]) \
        == Term("window", "text")


def test_phrase_and_wildcard():
    assert parse_query('"fast join"') == Phrase(["fast", "join"])
    assert parse_query('"solo"') == Term("solo")  # 1-word phrase = term
    assert parse_query("jo*") == Wildcard("jo*")
    assert parse_query("d?ta") == Wildcard("d?ta")


def test_empty_is_match_all():
    assert parse_query("") == MatchAll()
    assert parse_query("   ") == MatchAll()


def test_parse_errors():
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")
    with pytest.raises(QueryParseError):
        parse_query("a)")


def test_hyphen_inside_term_is_not_negation():
    q = parse_query("state-of-art")
    assert q == Term("state-of-art")


# ---------------- parsed strings vs oracle (rank identity) -----------------

def test_parsed_queries_rank_identical(engine, oracle):
    head, mid, rare = _terms_by_df(oracle)
    for s in [
        f"{mid[0]}",
        f"{mid[0]} {mid[1]}",
        f"{mid[0]} AND {mid[1]}",
        f"{mid[0]} AND ({mid[1]} OR {rare[0]})",
        f"+{mid[0]} {mid[1]}",
        f"{head} -{mid[0]}",
        f"{mid[0][:3]}*",
        f'"{mid[0]} {mid[1]}"',
    ]:
        q = parse_query(s)
        assert_rank_identical(engine, oracle, q, k=10)


def test_boost_scores_add_only_on_required(engine, oracle):
    _, mid, _ = _terms_by_df(oracle)
    q = parse_query(f"+{mid[0]} {mid[1]}")
    r = assert_rank_identical(engine, oracle, q, k=50)
    base = engine.search(Term(mid[0]), k=50)
    # result set == required set (the SHOULD clause widens nothing)
    assert r.total_hits == base.total_hits


def test_dangling_field_raises():
    with pytest.raises(QueryParseError):
        parse_query("title:")
    with pytest.raises(QueryParseError):
        parse_query("a AND")
    # a bare trailing '-' is NOT negation (no following token): it
    # lexes as the literal term '-'
    assert parse_query("-") == Term("-")


def test_search_text_convenience(engine, oracle):
    from tests.test_query import _terms_by_df

    _, mid, _ = _terms_by_df(oracle)
    a = engine.search_text(f"{mid[0]} AND {mid[1]}", k=10)
    from icat_lucene_ray.query import And, Term

    b = engine.search(And([Term(mid[0]), Term(mid[1])]), k=10)
    assert a.table.equals(b.table)


def test_fuzzy_syntax():
    from icat_lucene_ray.query.ast import Fuzzy

    assert parse_query("joyn~1") == Fuzzy("joyn", max_edits=1)
    assert parse_query("joyn~") == Fuzzy("joyn", max_edits=2)
    q = parse_query("lang:joyn~1")
    assert q == Fuzzy("joyn", max_edits=1, field="lang")
    # '~' not in trailing fuzzy position stays part of the term
    assert parse_query("a~b") == Term("a~b")
    # Lucene FuzzyQuery rejects maxEdits > 2 loudly — so do we
    import pytest as _pytest

    from icat_lucene_ray.query.parser import QueryParseError
    with _pytest.raises(QueryParseError, match="maxEdits"):
        parse_query("x~3")
    with _pytest.raises(QueryParseError, match="maxEdits"):
        parse_query("term~10")


def test_fuzzy_rank_matches_expansion(engine, oracle):
    """Fuzzy == OR-sum over the independently-computed edit-distance
    expansion (the same contract the SQL oracle checks)."""
    from icat_lucene_ray.query.ast import Fuzzy

    def lev(a: str, b: str) -> int:
        import numpy as _np
        d = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return int(d[-1])

    terms = _terms_by_df(oracle)[1][:1]  # any mid-df term
    base = terms[0]
    typo = base[:-1] + ("x" if base[-1] != "x" else "y")
    got = engine.search(Fuzzy(typo, max_edits=1), k=10)
    exp_terms = engine.expand_fuzzy(typo, 1)
    assert all(lev(t, typo) <= 1 for t in exp_terms)
    assert base in exp_terms
    from icat_lucene_ray.query.ast import Or as _Or

    ref = engine.search(_Or([Term(t) for t in exp_terms]), k=10)
    assert got.table.to_pydict() == ref.table.to_pydict()
    assert got.total_hits == ref.total_hits


def test_range_syntax():
    from icat_lucene_ray.query.ast import RangeFilter

    assert parse_query("n_chars:[100 TO 300]") == RangeFilter(
        "n_chars", 100, 300, include_lo=True, include_hi=True)
    assert parse_query("n_chars:{1.5 TO *}") == RangeFilter(
        "n_chars", 1.5, None, include_lo=False, include_hi=False)
    with pytest.raises(QueryParseError):
        parse_query("[1 TO 2]")  # range needs a field
    with pytest.raises(QueryParseError):
        parse_query("n_chars:[a TO b]")  # non-numeric bounds


def test_inline_boost_syntax():
    from icat_lucene_ray.query.ast import Weight

    assert parse_query("data^2") == Weight(Term("data"), 2.0)
    assert parse_query('"fast join"^1.5') == Weight(
        Phrase(("fast", "join")), 1.5)
    assert parse_query("a^b2") == Term("a^b2")  # non-numeric tail


def test_weight_multiplies_scores(engine, oracle):
    from icat_lucene_ray.query.ast import Weight

    head, mid, rare = _terms_by_df(oracle)
    base = engine.search(Term(mid[0]), k=10)
    boosted = engine.search(Weight(Term(mid[0]), 2.0), k=10)
    assert boosted.table["doc_id"].to_pylist() \
        == base.table["doc_id"].to_pylist()
    import numpy as _np

    assert _np.allclose(
        _np.asarray(boosted.table["score"].to_pylist()),
        2.0 * _np.asarray(base.table["score"].to_pylist()))


def test_regexp_syntax():
    from icat_lucene_ray.query.ast import Regexp, Weight

    assert parse_query("/jo.*/") == Regexp("jo.*")
    assert parse_query("lang:/en|de/") == Regexp("en|de", field="lang")
    assert parse_query("/a\\/b/") == Regexp("a/b")  # escaped slash
    assert parse_query("/jo(in|bs)/^2") == Weight(Regexp("jo(in|bs)"), 2.0)
    with pytest.raises(QueryParseError, match="bad regexp"):
        parse_query("/jo(/")
