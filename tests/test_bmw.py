"""Block-max pruned top-k (BMW read path): exact parity with the full
evaluator, and evidence that pruning actually skips block decodes."""

import numpy as np
import pytest

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.corpus import write_pages
from icat_lucene_ray.index.build import build_index
from icat_lucene_ray.query import Index, Term
from icat_lucene_ray.query.segment import SegmentReader


@pytest.fixture(scope="module")
def bmw_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("bmw")
    pages = str(root / "pages")
    write_pages(pages, 3000, rows_per_file=1000, vocab_size=2000)
    out = str(root / "idx")
    build_index(pages, out, meta_cols=["lang"],
                config=EngineConfig(num_segments=4))
    return out


def _full_topk(idx, stem, k, after=None):
    docs, scores = idx._eval_stems([stem])
    return idx._topk_scored(docs, scores, k, after)


def test_pruned_matches_full(bmw_index):
    idx = Index(bmw_index)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    probes = (ts["term"].iloc[:3].tolist()
              + ts["term"].iloc[len(ts) // 2:len(ts) // 2 + 3].tolist()
              + ts["term"].iloc[-3:].tolist())
    for t in probes:
        r = idx.search(Term(t), k=10)
        fd, fs = _full_topk(idx, idx.analyzer.analyze_query_term(t)[0], 10)
        assert r.table["doc_id"].to_pylist() == fd.tolist(), t
        assert np.allclose(r.table["score"].to_numpy(), fs, rtol=0, atol=0), t
        assert r.total_hits == idx.term_df(
            idx.analyzer.analyze_query_term(t)[0])


def test_pruned_pagination_matches_full(bmw_index):
    idx = Index(bmw_index)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    t = ts["term"].iloc[0]
    stem = idx.analyzer.analyze_query_term(t)[0]
    # walk three pages via the cursor; concatenation must equal full top-30
    got_d, got_s = [], []
    after = None
    for _ in range(3):
        r = idx.search(Term(t), k=10, search_after=after)
        got_d += r.table["doc_id"].to_pylist()
        got_s += r.table["score"].to_pylist()
        after = r.search_after
    fd, fs = _full_topk(idx, stem, 30)
    assert got_d == fd.tolist()
    assert np.allclose(got_s, fs, rtol=0, atol=0)


def test_pruning_skips_blocks(bmw_index, monkeypatch):
    """For a head term with many blocks, k=10 must decode only a small
    prefix of blocks (bound-ordered early termination)."""
    idx = Index(bmw_index)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    t = ts["term"].iloc[0]
    stem = idx.analyzer.analyze_query_term(t)[0]
    total_blocks = -(-idx.term_df(stem) // idx.cfg.codec_block)
    assert total_blocks > 8, "fixture too small to show pruning"

    decoded = {"n": 0}
    orig = SegmentReader.score_blocks

    def spy(self, term, bucket, idf, k1, b, avgdl, sel_blocks):
        decoded["n"] += len(sel_blocks)
        return orig(self, term, bucket, idf, k1, b, avgdl, sel_blocks)

    monkeypatch.setattr(SegmentReader, "score_blocks", spy)
    idx2 = Index(bmw_index)
    r = idx2.search(Term(t), k=10)
    assert r.table.num_rows == 10
    assert 0 < decoded["n"] < total_blocks


def test_pruned_actor_mode_matches_inline(bmw_index):
    idx_in = Index(bmw_index)
    idx_ac = Index(bmw_index, use_actors=True, num_actors=2)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx_in.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    for t in ts["term"].iloc[[0, len(ts) // 2, -1]]:
        a = idx_in.search(Term(t), k=10)
        b = idx_ac.search(Term(t), k=10)
        assert a.table.equals(b.table), t
        assert a.total_hits == b.total_hits


def _top_terms(idx, n=6):
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    return ts["term"].tolist()


def test_or_pruned_matches_full(bmw_index):
    """MaxScore OR (exact_total=False): identical top-k docs + scores
    to the exact evaluator across head/mid/tail term mixes."""
    from icat_lucene_ray.query import Or

    idx = Index(bmw_index)
    terms = _top_terms(idx)
    mixes = [
        terms[:2], terms[:4],
        [terms[0], terms[len(terms) // 2], terms[-1]],
        terms[len(terms) // 2:len(terms) // 2 + 3],
    ]
    for mix in mixes:
        q = Or([Term(t) for t in mix])
        exact = idx.search(q, k=10)
        fast = idx.search(q, k=10, exact_total=False)
        assert fast.table["doc_id"].to_pylist() \
            == exact.table["doc_id"].to_pylist(), mix
        # fp association order differs between full union-sum and the
        # pruned accumulate path — values identical to 1e-12 relative
        assert np.allclose(fast.table["score"].to_numpy(),
                           exact.table["score"].to_numpy(), rtol=1e-12)
        assert fast.total_hits <= exact.total_hits  # lower bound


def test_or_pruned_decodes_less(bmw_index):
    """The pruned OR must decode strictly fewer posting values than the
    full evaluator when the head term dominates."""
    from icat_lucene_ray.query import Or
    from icat_lucene_ray.query.segment import (
        DECODE_STATS, reset_decode_stats,
    )

    # classic WAND win shape: selective mid-df terms set a high theta,
    # the huge low-idf head list is then only PROBED at candidates
    idx0 = Index(bmw_index)
    terms = _top_terms(idx0)
    mids = terms[len(terms) // 3:len(terms) // 3 + 2]
    q = Or([Term(t) for t in mids + [terms[0]]])

    idx_full = Index(bmw_index)
    reset_decode_stats()
    idx_full.search(q, k=10)
    full_cost = DECODE_STATS["postings"] + DECODE_STATS["blocks"]

    idx_fast = Index(bmw_index)
    reset_decode_stats()
    idx_fast.search(q, k=10, exact_total=False)
    fast_cost = DECODE_STATS["postings"] + DECODE_STATS["blocks"]
    assert 0 < fast_cost < full_cost


def test_or_pruned_pagination(bmw_index):
    from icat_lucene_ray.query import Or

    idx = Index(bmw_index)
    terms = _top_terms(idx)
    q = Or([Term(t) for t in terms[:3]])
    after = None
    got = []
    for _ in range(3):
        r = idx.search(q, k=10, exact_total=False, search_after=after)
        got += r.table["doc_id"].to_pylist()
        after = r.search_after
    exact = idx.search(q, k=30)
    assert got == exact.table["doc_id"].to_pylist()


def test_conjunction_skip_decodes_selected_blocks_only(bmw_index):
    """score_term with a narrow doc_range (the AND skip path) must
    decode O(selected blocks) of the doc stream — same block-restart
    reconstruction as score_blocks — and match the full-decode answer
    exactly."""
    import pyarrow.dataset as pads

    from icat_lucene_ray.query.segment import (
        DECODE_STATS, SegmentReader, reset_decode_stats,
    )

    idx = Index(bmw_index)
    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    t = ts["term"].iloc[0]
    stem = idx.analyzer.analyze_query_term(t)[0]
    from icat_lucene_ray.index.docids import term_shard

    seg_id = term_shard(stem.encode(), len(idx._paths))
    path = idx._paths[seg_id]

    # reference: full decode, then mask to the range
    ref_reader = SegmentReader(path, idx.cfg.codec_block)
    got = ref_reader.postings(stem, 0)
    assert got is not None and len(got[0]) > idx.cfg.codec_block * 4, \
        "fixture term too small to show skipping"
    full_d, _tf, _dl = got
    lo = int(full_d[len(full_d) // 2])
    hi = int(full_d[len(full_d) // 2 + 20])
    fsel = (full_d >= lo) & (full_d <= hi)
    fd, fs = ref_reader.score_term(stem, 0, 1.5, 1.2, 0.75, 100.0,
                                   doc_range=(lo, hi))  # cached: full path

    # fresh reader (cold cache): the skip path must engage
    reader = SegmentReader(path, idx.cfg.codec_block)
    reset_decode_stats()
    d, s = reader.score_term(stem, 0, 1.5, 1.2, 0.75, 100.0,
                             doc_range=(lo, hi))
    assert DECODE_STATS["postings"] == 0  # never fell back to postings()
    # decode volume bounded by the selected blocks, far below df
    assert 0 < DECODE_STATS["blocks"] < len(full_d)
    assert DECODE_STATS["blocks"] <= 3 * idx.cfg.codec_block
    assert d.tolist() == full_d[fsel].tolist() == fd.tolist()
    assert np.allclose(s, fs, rtol=0, atol=0)
