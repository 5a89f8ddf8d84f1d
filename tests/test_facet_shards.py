"""Sharded serving state: facet state on the SegmentActor pool (ST2 at
cluster scale) and per-fragment fan-out of Filter/RangeFilter scans."""

from __future__ import annotations

import pytest

from icat_lucene_ray.query.ast import And, Filter, MatchAll, RangeFilter, Term


@pytest.fixture(scope="module")
def actor_engine(ray_session, built_index):
    from icat_lucene_ray.query import Index

    return Index(built_index.root, use_actors=True, num_actors=2)


def _head_term(oracle):
    return max(oracle.postings.items(), key=lambda kv: len(kv[1]))[0]


def test_actor_facets_match_driver_state(engine, actor_engine, oracle):
    """Actor-mode facet counts must equal the single-process FacetState
    path — and the forward arrays must be resident in the ACTORS, never
    loaded into the serving (driver) process."""
    term = _head_term(oracle)
    for q in [Term(term), MatchAll()]:
        want = engine.facets(q, dims=["lang"])
        got = actor_engine.facets(q, dims=["lang"])
        assert got == want
    # range facets over an ad-hoc (non-sidecar) numeric column
    ranges = {"doc_len": [("short", 0, 100), ("mid", 100, 500),
                          ("long", 500, 3000)]}
    want = engine.facets(MatchAll(), dims=[], ranges=ranges)
    got = actor_engine.facets(MatchAll(), dims=[], ranges=ranges)
    assert got == want
    # state residency: actor engine never built driver-side FacetState,
    # and the actors report the full corpus resident in their shards
    assert getattr(actor_engine, "_facet_state", None) is None
    assert actor_engine._facet_rows_resident_remote == actor_engine.N


def test_actor_facets_sparse_all_dims(engine, actor_engine):
    assert actor_engine.facets(MatchAll()) == engine.facets(MatchAll())


def test_filter_scan_fans_out(engine, monkeypatch):
    """Dense-mode Filter/RangeFilter scans run as per-fragment Ray tasks
    (same shape as the field-sorted path), not a driver loop."""
    monkeypatch.setattr(engine, "scan_fanout_min_files", 1)
    monkeypatch.setattr(engine, "_filter_scan_tasks", 0, raising=False)
    q = And([MatchAll()], filters=[Filter("lang", ["en", "de"])])
    fanned = engine.search(q, k=10)
    n_tasks = engine._filter_scan_tasks
    assert n_tasks > 0

    monkeypatch.setattr(engine, "scan_fanout_min_files", 10**9)
    inline = engine.search(q, k=10)
    assert engine._filter_scan_tasks == n_tasks  # inline path this time
    assert fanned.total_hits == inline.total_hits
    assert fanned.table.equals(inline.table)

    monkeypatch.setattr(engine, "scan_fanout_min_files", 1)
    rq = And([MatchAll()], filters=[RangeFilter("doc_len", 100, 500)])
    monkeypatch.setattr(engine, "scan_fanout_min_files", 10**9)
    want = engine.search(rq, k=10)
    monkeypatch.setattr(engine, "scan_fanout_min_files", 1)
    got = engine.search(rq, k=10)
    assert got.total_hits == want.total_hits and got.table.equals(want.table)


def test_match_all_paths_avoid_id_universe(engine, monkeypatch):
    """count/search/facets on MatchAll must not materialize the O(N) id
    universe (the dense-id arithmetic paths)."""
    want_count = engine.count(MatchAll())
    want_search = engine.search(MatchAll(), k=5)
    want_facets = engine.facets(MatchAll(), dims=["lang"])

    def boom(*_a, **_k):
        raise AssertionError("all_doc_ids materialized for MatchAll")

    monkeypatch.setattr(engine, "all_doc_ids", boom)
    monkeypatch.setattr(engine, "_all_docs", None)
    assert engine.count(MatchAll()) == want_count == engine.N
    r = engine.search(MatchAll(), k=5)
    assert r.total_hits == want_search.total_hits
    assert r.table.equals(want_search.table)
    # cursor pagination stays consistent
    r2 = engine.search(MatchAll(), k=5, search_after=r.search_after)
    assert r2.table["doc_id"].to_pylist() == [5, 6, 7, 8, 9]
    assert engine.facets(MatchAll(), dims=["lang"]) == want_facets
