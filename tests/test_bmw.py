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
