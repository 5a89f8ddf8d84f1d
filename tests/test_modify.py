"""Incremental modify path — create/update/delete + commit visibility +
delete-by-query + force_merge (FIXTURES.md model: reference semantics
from Lucene.java:484-513 (modify), 327-330 (update = delete+add),
301-317 (delete-by-query), 571-587 (commit visibility))."""

import numpy as np
import pytest

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.corpus import write_pages
from icat_lucene_ray.index.build import build_index
from icat_lucene_ray.index.modify import IndexUpdater, force_merge
from icat_lucene_ray.query import And, Index, MatchAll, Term


CFG = EngineConfig(num_segments=4)


@pytest.fixture()
def small_index(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(pages, 120, rows_per_file=60, vocab_size=800)
    out = str(tmp_path / "idx")
    build_index(pages, out, meta_cols=["lang"], config=CFG)
    return out


def _hits(idx, q, k=200):
    r = idx.search(q, k=k)
    return set(r.table["doc_id"].to_pylist())


def test_create_visible_only_after_commit(small_index):
    up = IndexUpdater(small_index)
    up.create({"url": "https://x.test/new1", "text": "zanzibar quokka zanzibar",
               "lang": "en"})
    assert Index(small_index).count(Term("zanzibar")) == 0  # not committed
    up.commit()
    idx = Index(small_index)
    assert idx.count(Term("zanzibar")) == 1
    r = idx.search(Term("quokka"), k=5, fields=["lang", "url"])
    assert r.table["url"].to_pylist() == ["https://x.test/new1"]
    # stats were updated exactly
    assert idx.N == 121


def test_delete_removes_from_search_and_facets(small_index):
    idx0 = Index(small_index)
    victim = int(idx0.search(MatchAll(), k=1).table["doc_id"][0].as_py())
    up = IndexUpdater(small_index)
    up.delete(victim)
    up.commit()
    idx = Index(small_index)
    assert victim not in set(idx.all_doc_ids())
    assert idx.N == 119
    assert victim not in _hits(idx, MatchAll())


def test_update_replaces_content(small_index):
    idx0 = Index(small_index)
    # find a doc matching some term, replace its text entirely
    any_doc = idx0.search(MatchAll(), k=1, fields=["url"])
    did = int(any_doc.table["doc_id"][0].as_py())
    url = any_doc.table["url"][0].as_py()
    up = IndexUpdater(small_index)
    up.update({"doc_id": did, "url": url, "text": "xylophone only", "lang": "en"})
    up.commit()
    idx = Index(small_index)
    assert _hits(idx, Term("xylophone")) == {did}
    # the old content of that doc no longer matches anything
    for stem_q in (Term("xylophone"),):
        pass
    # doc count unchanged (update = delete + add of same id)
    assert idx.N == 120
    # fetching the doc returns the NEW stored fields only
    t = idx.search(Term("xylophone"), k=5, fields=["url"]).table
    assert t.num_rows == 1 and t["url"][0].as_py() == url


def test_update_twice_latest_wins(small_index):
    up = IndexUpdater(small_index)
    up.create({"url": "https://x.test/v", "text": "versioned alpha", "lang": "en"})
    up.commit()
    did = int(Index(small_index).search(Term("versioned"), k=1)
              .table["doc_id"][0].as_py())
    up2 = IndexUpdater(small_index)
    up2.update({"doc_id": did, "url": "https://x.test/v",
                "text": "versioned beta", "lang": "en"})
    up2.commit()
    idx = Index(small_index)
    assert _hits(idx, And([Term("versioned"), Term("beta")])) == {did}
    assert _hits(idx, Term("alpha")) == set()
    # exactly one live doc-store row for the id
    t = idx._doc_store_table(columns=["doc_id"])
    ids = t["doc_id"].to_pylist()
    assert ids.count(did) == 1


def test_delete_by_query(small_index):
    idx0 = Index(small_index)
    # pick the corpus's most frequent stem directly from the index
    import pyarrow.dataset as pads

    ts = pads.dataset(idx0.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    q = Term(ts["term"].iloc[0])
    n = idx0.count(q)
    assert n > 0
    up = IndexUpdater(small_index)
    assert up.delete_by_query(q) == n
    up.commit()
    idx = Index(small_index)
    assert idx.count(q) == 0
    assert idx.N == 120 - n


def test_modify_op_array(small_index):
    up = IndexUpdater(small_index)
    up.modify([
        {"create": {"url": "https://x.test/a", "text": "oparray one", "lang": "en"}},
        {"create": {"url": "https://x.test/b", "text": "oparray two", "lang": "en"}},
    ])
    up.commit()
    assert Index(small_index).count(Term("oparray")) == 2


def test_force_merge_equals_fresh_build(ray_session, tmp_path):
    """modify+merge == building from scratch over the final corpus:
    identical segment bytes and identical search results."""
    pages = str(tmp_path / "pages")
    write_pages(pages, 100, rows_per_file=50, vocab_size=600)
    idx_dir = str(tmp_path / "idx")
    build_index(pages, idx_dir, meta_cols=["lang"], config=CFG)

    # mutate: delete 3 docs, update 1, add 2
    idx0 = Index(idx_dir)
    ids = sorted(idx0.all_doc_ids().tolist())
    up = IndexUpdater(idx_dir)
    for d in ids[:3]:
        up.delete(d)
    up.update({"doc_id": ids[5], "url": "https://u.test/upd",
               "text": "merged content alpha beta", "lang": "en"})
    up.create({"url": "https://u.test/n1", "text": "fresh gamma delta", "lang": "de"})
    up.create({"url": "https://u.test/n2", "text": "fresh epsilon", "lang": "fr"})
    up.commit()

    merged = str(tmp_path / "merged")
    force_merge(idx_dir, merged)

    midx = Index(merged)
    # live ids match the incremental view
    live = Index(idx_dir)
    assert set(midx.all_doc_ids()) == set(live.all_doc_ids())
    assert midx.N == live.N
    # after merge, df is exact again and results match the live view
    for q in (Term("fresh"), Term("merged"), MatchAll()):
        assert _hits(midx, q) == _hits(live, q)
    # deleted docs' postings are physically gone
    for d in ids[:3]:
        assert d not in set(midx.all_doc_ids())


def test_search_scores_consistent_after_merge(ray_session, tmp_path):
    """Post-merge BM25 == fresh-build BM25 over the same live corpus
    (rank + score identity on a term query)."""
    pages = str(tmp_path / "pages")
    write_pages(pages, 80, rows_per_file=40, vocab_size=500)
    idx_dir = str(tmp_path / "idx")
    build_index(pages, idx_dir, meta_cols=["lang"], config=CFG)
    up = IndexUpdater(idx_dir)
    victims = sorted(Index(idx_dir).all_doc_ids().tolist())[:5]
    for d in victims:
        up.delete(d)
    up.commit()
    merged = str(tmp_path / "merged")
    force_merge(idx_dir, merged)

    midx = Index(merged)
    import pyarrow.dataset as pads

    ts = pads.dataset(midx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    probe = ts["term"].iloc[0]
    r = midx.search(Term(probe), k=10)
    # brute-force oracle over the surviving raw corpus, ids taken from
    # the merged index's live doc store (dense ids are build-assigned)
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from icat_lucene_ray.query.oracle import OracleIndex

    live = midx._doc_store_table(columns=["url"])
    id_of = dict(zip(live["url"].to_pylist(), live["doc_id"].to_pylist()))
    corpus = pa.concat_tables([pq.read_table(f) for f in
                               sorted(glob.glob(pages + "/*.parquet"))])
    urls = corpus["url"].to_pylist()
    keep = np.array([u in id_of for u in urls])
    corpus = corpus.filter(pa.array(keep))
    ids = pa.array([id_of[u] for u in corpus["url"].to_pylist()], pa.int64())
    oracle = OracleIndex(corpus.append_column("doc_id", ids),
                         id_col="doc_id")
    e = oracle.search(Term(probe), k=10)
    got = [(int(d), round(float(s), 9)) for d, s in
           zip(r.table["doc_id"].to_pylist(), r.table["score"].to_pylist())]
    want = [(int(d), round(float(s), 9)) for d, s in e]
    assert got == want


def test_facets_and_sort_respect_tombstones(small_index):
    idx0 = Index(small_index)
    f0 = idx0.facets(MatchAll(), dims=["lang"])["lang"]
    # delete every doc of the most common language
    top_lang = max(f0, key=f0.get)
    import pyarrow.dataset as pads

    victims = idx0._doc_ids_where(
        pads.field("lang") == top_lang, ("lang",)).tolist()
    up = IndexUpdater(small_index)
    for d in victims:
        up.delete(d)
    up.create({"url": "https://f.test/n", "text": "facetful doc", "lang": "xx"})
    up.commit()

    idx = Index(small_index)
    f1 = idx.facets(MatchAll(), dims=["lang"])["lang"]
    assert top_lang not in f1
    assert f1.get("xx") == 1
    assert sum(f1.values()) == idx.N
    # field-sorted search never returns tombstoned ids
    r = idx.search(MatchAll(), k=50, sort=[("lang", False)])
    assert not set(r.table["doc_id"].to_pylist()) & set(victims)


def test_facets_shadow_updated_docs(small_index, tmp_path):
    """ST2 sidecar path: a doc UPDATED in a delta keeps its doc_id but
    must facet with the NEW metadata (the stale base sidecar row is
    shadowed by the delta doc store)."""
    import shutil

    root = str(tmp_path / "idx_shadow")
    shutil.copytree(small_index, root)
    idx0 = Index(root)
    t = idx0._doc_store_table(columns=["url", "lang"])
    url0 = t["url"][0].as_py()
    f0 = idx0.facets(MatchAll(), dims=["lang"])["lang"]
    up = IndexUpdater(root)
    up.update({"url": url0, "text": "updated body", "lang": "zz"})
    up.commit()
    idx = Index(root)
    f1 = idx.facets(MatchAll(), dims=["lang"])["lang"]
    assert f1.get("zz") == 1
    assert sum(f1.values()) == sum(f0.values()) == idx.N


def test_clear_then_reuse(small_index, tmp_path):
    """S6 clear (Lucene.java:547-566): everything gone, index stays
    writable — a later create/commit works and is searchable."""
    import shutil

    from icat_lucene_ray.index.modify import clear_index

    root = str(tmp_path / "idx_clear")
    shutil.copytree(small_index, root)
    m = clear_index(root)
    assert m.num_docs == 0
    idx = Index(root)
    assert idx.count(MatchAll()) == 0
    assert idx.search(Term("the"), k=5).total_hits == 0
    up = IndexUpdater(root)
    up.create({"url": "https://c.test/1", "text": "reborn phoenix doc",
               "lang": "en"})
    up.commit()
    idx2 = Index(root)
    assert idx2.count(MatchAll()) == 1
    r = idx2.search(Term("phoenix"), k=5, fields=["url"])
    assert r.total_hits == 1
    assert r.table["url"][0].as_py() == "https://c.test/1"


def test_populate_scores_on_field_sort(small_index):
    """K6 populateScores (Lucene.java:1498-1500): field-sorted hits get
    real relevance scores for the scoring query."""
    import numpy as np

    idx = Index(small_index)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    probe = ts["term"].iloc[0]
    r = idx.search(Term(probe), k=5, sort=[("doc_len", True)],
                   populate_scores=True)
    assert "score" in r.table.column_names
    scores = dict(zip(r.table["doc_id"].to_pylist(),
                      r.table["score"].to_pylist()))
    rel = idx.search(Term(probe), k=idx.N)
    truth = dict(zip(rel.table["doc_id"].to_pylist(),
                     rel.table["score"].to_pylist()))
    for d, s in scores.items():
        assert np.isclose(s, truth[d], rtol=1e-12), d
    # MatchAll sort keeps constant scores
    r2 = idx.search(MatchAll(), k=3, sort=[("doc_len", False)],
                    populate_scores=True)
    assert r2.table["score"].to_pylist() == [1.0, 1.0, 1.0]


def test_increment_statistics(ray_session, tmp_path):
    """M8 aggregateFileSize/pruneDocument (Lucene.java:660-721,
    1734-1750): numeric stored fields increment in place; postings are
    carried over (doc still matches its text) without re-analysis."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({
        "url": pa.array(["u1", "u2"]),
        "text": pa.array(["dataset holder alpha", "other text beta"]),
        "fileSize": pa.array([100, 50], pa.int64()),
        "fileCount": pa.array([2, 1], pa.int64()),
    }), str(src / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index(str(src), root, meta_cols=["fileSize", "fileCount"],
                config=CFG)
    up = IndexUpdater(root)
    assert up.increment_statistics({"url": "u1"},
                                   {"fileSize": 42, "fileCount": 3})
    assert not up.increment_statistics({"url": "nope"}, {"fileSize": 1})
    up.commit()
    idx = Index(root)
    r = idx.search(Term("alpha"), k=5, fields=["fileSize", "fileCount"])
    assert r.total_hits == 1  # postings survived the prune+re-add
    assert r.table["fileSize"][0].as_py() == 142
    assert r.table["fileCount"][0].as_py() == 5
    assert idx.N == 2  # in-place update, not a new doc
    # second increment on the DELTA row compounds correctly
    up2 = IndexUpdater(root)
    assert up2.increment_statistics({"url": "u1"}, {"fileSize": -2})
    up2.commit()
    idx2 = Index(root)
    r2 = idx2.search(Term("alpha"), k=5, fields=["fileSize"])
    assert r2.table["fileSize"][0].as_py() == 140
    assert idx2.N == 2


def test_escape_path_parses_literal():
    """M10 escapePath (SearchBucket.java:200-204): escaped slashes
    survive parsing as one literal term."""
    from icat_lucene_ray.query import Term, parse_query
    from icat_lucene_ray.query.parser import escape_path

    assert escape_path("/a/b c") == "\\/a\\/b c"
    assert escape_path("\\/x/y") == "\\/x\\/y"  # idempotent on escaped
    q = parse_query(escape_path("/dir1/sub"))
    assert q == parse_query("/dir1/sub".replace("/", "\\/"))
    assert q == Term("/dir1/sub")
