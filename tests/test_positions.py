"""Positional postings + true Phrase queries (Q4, behind
EngineConfig(positions=True)) — reference semantics
``TestLucene.java:147-171`` (adjacent-term phrases), scores = BM25 sum
of the member terms over adjacency matches (documented divergence from
Lucene phrase-frequency scoring)."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.query import Phrase, Term

from tests.test_query import assert_rank_identical


def test_positional_kernel_matches_scalar():
    """Batch positional kernel ≡ scalar tokens_with_positions for every
    analyzer chain (incl. stop-word gaps and synonym same-position)."""
    from icat_lucene_ray.analysis import get_analyzer
    from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "data JOIN data  merge   fast join",
        "", "   ",
        "TokenStream's analyzing 3.14,x values He and the He",
        "a b a b a b",
    ]
    for name in ("simple", "icat", "icat_synonym"):
        an = get_analyzer(name)
        van = VectorizedAnalyzer(an)
        offs, terms, tfs, _dls, pos = van.term_freq_batch_pos(pa.array(texts))
        pcs = 0
        for i, txt in enumerate(texts):
            got = {}
            for t, c in zip(terms.to_pylist()[offs[i]:offs[i + 1]],
                            tfs[offs[i]:offs[i + 1]]):
                got[t] = sorted(pos[pcs:pcs + c].tolist())
                pcs += c
            exp = defaultdict(list)
            for s, j in an.tokens_with_positions(txt):
                exp[s].append(j)
            assert got == {k: sorted(v) for k, v in exp.items()}, (name, i)


@pytest.fixture(scope="session")
def pos_index(ray_session, pages_dir, tmp_path_factory):
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("posidx") / "idx")
    cfg = EngineConfig(positions=True, num_segments=4,
                       salt_df_threshold=200, target_slice_postings=200)
    return build_index(pages_dir, out, meta_cols=["lang"], config=cfg)


@pytest.fixture(scope="session")
def pos_engine(pos_index):
    from icat_lucene_ray.query import Index

    return Index(pos_index.root)


@pytest.fixture(scope="session")
def pos_oracle(pages_table, pos_engine):
    from icat_lucene_ray.query import OracleIndex

    t = pos_engine._doc_store_table(columns=["url"])
    m = dict(zip(t["url"].to_pylist(), t["doc_id"].to_pylist()))
    ids = pa.array([m[u] for u in pages_table["url"].to_pylist()], pa.int64())
    tbl = pages_table.append_column("doc_id", ids)
    return OracleIndex(tbl, analyzer="icat", id_col="doc_id", positions=True)


def _adjacent_pair(oracle):
    """A term pair that occurs adjacently in SOME docs while its terms
    co-occur in strictly more docs (so positional ⊂ phrase-lite)."""
    from collections import Counter

    nxt: dict = {}
    for stem, dmap in oracle.pos_map.items():
        for did, plist in dmap.items():
            for p in plist:
                nxt[(did, p)] = stem
    c = Counter()
    for (did, p), s1 in nxt.items():
        s2 = nxt.get((did, p + 1))
        if s2 is not None:
            c[(s1, s2)] += 1
    for (s1, s2), n in c.most_common():
        adj_docs = {
            did for did, plist in oracle.pos_map[s1].items()
            if any(p + 1 in oracle.pos_map[s2].get(did, ()) for p in plist)}
        co = len(set(oracle.postings[s1]) & set(oracle.postings[s2]))
        if co > len(adj_docs):
            return s1, s2
    (s1, s2), _n = c.most_common(1)[0]
    return s1, s2


def test_phrase_positional_rank_identity(pos_engine, pos_oracle):
    s1, s2 = _adjacent_pair(pos_oracle)
    assert_rank_identical(pos_engine, pos_oracle, Phrase([s1, s2]), k=20)


def test_phrase_positional_subset_of_lite(pos_engine, pos_oracle):
    s1, s2 = _adjacent_pair(pos_oracle)
    from icat_lucene_ray.query.ast import And

    n_phrase = pos_engine.count(Phrase([s1, s2]))
    n_lite = pos_engine.count(And([Term(s1), Term(s2)]))
    assert 0 < n_phrase < n_lite  # pair chosen to make both strict


def test_phrase_three_terms(pos_engine, pos_oracle):
    # extend an adjacent pair with whatever follows it in some doc
    s1, s2 = _adjacent_pair(pos_oracle)
    nxt = None
    for did, plist in pos_oracle.pos_map[s1].items():
        for p in plist:
            if p + 1 in pos_oracle.pos_map[s2].get(did, []):
                for s3, dmap in pos_oracle.pos_map.items():
                    if p + 2 in dmap.get(did, []):
                        nxt = s3
                        break
            if nxt:
                break
        if nxt:
            break
    if nxt is None:
        pytest.skip("corpus has no 3-term adjacency")
    assert_rank_identical(pos_engine, pos_oracle, Phrase([s1, s2, nxt]), k=20)


def test_positional_commit_then_phrase(pos_index, tmp_path_factory,
                                       ray_session):
    """Delta commits carry positional streams: a created doc is phrase-
    findable; an update supersedes the old positions."""
    import shutil

    from icat_lucene_ray.index.modify import IndexUpdater
    from icat_lucene_ray.query import Index

    root = str(tmp_path_factory.mktemp("posmod") / "idx")
    shutil.copytree(pos_index.root, root)
    up = IndexUpdater(root)
    up.create({"url": "u-pos-1", "text": "alpha bravoz charlie", "lang": "en"})
    up.commit()
    idx = Index(root)
    assert idx.count(Phrase(["alpha", "bravoz"])) == 1
    assert idx.count(Phrase(["bravoz", "alpha"])) == 0  # order matters
    up2 = IndexUpdater(root)
    up2.update({"url": "u-pos-1", "text": "charlie alpha bravoz", "lang": "en"})
    up2.commit()
    idx2 = Index(root)
    assert idx2.count(Phrase(["charlie", "alpha"])) == 1
    assert idx2.count(Phrase(["alpha", "bravoz"])) == 1


def test_positional_force_merge(pos_index, tmp_path_factory, ray_session):
    """force_merge preserves positional streams (phrase results
    identical before/after)."""
    import shutil

    from icat_lucene_ray.index.modify import IndexUpdater, force_merge
    from icat_lucene_ray.query import Index

    root = str(tmp_path_factory.mktemp("posmrg") / "idx")
    shutil.copytree(pos_index.root, root)
    up = IndexUpdater(root)
    up.create({"url": "u-pm-1", "text": "delta echoz foxtrot", "lang": "en"})
    up.commit()
    merged = str(tmp_path_factory.mktemp("posmrg") / "merged")
    force_merge(root, merged)
    idx = Index(merged)
    assert idx.count(Phrase(["delta", "echoz"])) == 1
    assert idx.count(Phrase(["echoz", "delta"])) == 0


def test_phrase_positional_synonyms(ray_session, tmp_path_factory):
    """Phrase through the synonym analyzer (reference
    ``TestLucene.java:147-171``): each phrase position expands to its
    synonym class sharing the position, so 'hydrogen peroxide' matches a
    doc written as 'h peroxide' and vice versa — while order still
    matters and adjacency is still enforced."""
    import pyarrow.parquet as pq_mod

    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.query import Index

    d = tmp_path_factory.mktemp("possyn")
    docs = pa.table({
        "url": [f"u{i}" for i in range(5)],
        "text": [
            "hydrogen peroxide solution",      # exact phrase
            "h peroxide bleaching agent",      # symbol form of position 0
            "peroxide hydrogen reversed",      # wrong order
            "hydrogen strong peroxide",        # gap — not adjacent
            "sodium chloride crystals",        # unrelated
        ],
        "lang": ["en"] * 5,
    })
    pq_mod.write_table(docs, str(d / "docs.parquet"))
    out = str(d / "idx")
    cfg = EngineConfig(positions=True, num_segments=2)
    build_index(str(d), out, meta_cols=["lang"], analyzer="icat_synonym",
                config=cfg)
    idx = Index(out)
    urls = {}
    for q in (Phrase(["hydrogen", "peroxide"]), Phrase(["h", "peroxide"])):
        r = idx.search(q, k=10, fields=["url"])
        urls[tuple(q.terms)] = set(r.table["url"].to_pylist())
    # both spellings match BOTH surface forms, nothing else
    assert urls[("hydrogen", "peroxide")] == {"u0", "u1"}
    assert urls[("h", "peroxide")] == {"u0", "u1"}
    # single-position phrase degenerates to the synonym-class OR
    assert idx.count(Phrase(["hydrogen"])) == 4  # u0 u1 u2 u3


def test_phrase_positional_actor_mode(pos_index, pos_oracle):
    """Actor-pool serving of positional phrases: decode + candidate
    intersection run on the SegmentActors; results identical to
    inline."""
    from icat_lucene_ray.query import Index

    s1, s2 = _adjacent_pair(pos_oracle)
    idx_in = Index(pos_index.root)
    idx_ac = Index(pos_index.root, use_actors=True, num_actors=2)
    a = idx_in.search(Phrase([s1, s2]), k=20)
    b = idx_ac.search(Phrase([s1, s2]), k=20)
    assert a.table.equals(b.table)
    assert a.total_hits == b.total_hits


def test_sloppy_phrase_window(ray_session, tmp_path):
    """Hand corpus with known gaps: slop N matches exactly the docs
    whose in-order window stretch is <= N; slop on a phrase-lite index
    raises instead of silently approximating."""
    import pyarrow.parquet as pq2

    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.query import Index, Phrase, parse_query

    docs = [
        "alpha beta x",            # adjacent: stretch 0
        "alpha x beta",            # one gap: stretch 1
        "alpha x y beta",          # stretch 2
        "beta x alpha",            # wrong order: never matches
        "alpha x y z w beta",      # stretch 4
    ]
    src = str(tmp_path / "sloppy.parquet")
    pq2.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}), src)
    from icat_lucene_ray.config import EngineConfig

    out = str(tmp_path / "sloppy_idx")
    build_index(src, out, text_col="text", id_col="doc_id",
                config=EngineConfig(analyzer="simple", num_segments=2,
                                    positions=True))
    idx = Index(out)

    def ids(slop):
        r = idx.search(Phrase(["alpha", "beta"], slop=slop), k=10)
        return sorted(r.table["doc_id"].to_pylist())

    assert ids(0) == [0]
    assert ids(1) == [0, 1]
    assert ids(2) == [0, 1, 2]
    assert ids(4) == [0, 1, 2, 4]
    # parser round-trip
    r = idx.search(parse_query('"alpha beta"~1'), k=10)
    assert sorted(r.table["doc_id"].to_pylist()) == [0, 1]

    # phrase-lite index: slop must raise
    out2 = str(tmp_path / "lite_idx")
    build_index(src, out2, text_col="text", id_col="doc_id",
                config=EngineConfig(analyzer="simple", num_segments=2))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positions"):
        Index(out2).search(Phrase(["alpha", "beta"], slop=1), k=10)
