"""Edge-case robustness: empty/null/whitespace/unicode texts, k > N,
single-doc corpora — end to end through build + search."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.index.build import build_index
from icat_lucene_ray.query import Index, MatchAll, Term


def test_degenerate_texts_and_unicode(ray_session, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(6)]),
        "text": pa.array(["", None, "   ", "héllo wörld héllo",
                          "日本語 テスト", "emoji 🎉 test"]),
    })
    pq.write_table(t, os.path.join(src, "p.parquet"))
    out = str(tmp_path / "idx")
    build_index(src, out, config=EngineConfig(num_segments=2))
    idx = Index(out)
    assert idx.N == 6                      # empty docs still stored
    assert idx.count(MatchAll()) == 6
    assert idx.count(Term("héllo")) == 1   # diacritics preserved
    assert idx.count(Term("test")) == 1    # emoji stripped, words kept
    r = idx.search(Term("héllo"), k=5, fields=["url"])
    assert r.table["url"].to_pylist() == ["u3"]
    assert idx.search(MatchAll(), k=100).table.num_rows == 6  # k > N


def test_single_doc_corpus(ray_session, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(pa.table({"url": ["one"], "text": ["solitary document"]}),
                   os.path.join(src, "p.parquet"))
    out = str(tmp_path / "idx")
    m = build_index(src, out, config=EngineConfig(num_segments=4))
    idx = Index(out)
    assert idx.N == 1 and m.num_docs == 1
    r = idx.search(Term("solitary"), k=10)
    assert r.table["doc_id"].to_pylist() == [0]  # dense id
    assert r.total_hits == 1
