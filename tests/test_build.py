"""Index-build structural checks: manifest stats vs oracle truth,
salting activation, segment layout."""

import os

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def test_manifest_stats_match_oracle(built_index, oracle):
    assert built_index.num_docs == oracle.N
    assert abs(built_index.avgdl - oracle.avgdl) < 1e-9
    assert built_index.total_tokens == sum(oracle.doc_len.values())


def test_segments_exist_and_cover_terms(built_index, oracle):
    seg_terms = 0
    total_postings = 0
    for s in built_index.segments:
        p = built_index.segment_path(s["seg_id"])
        assert os.path.exists(p)
        t = pq.read_table(p, columns=["term", "bucket", "df"])
        seg_terms += t.num_rows
        total_postings += int(np.sum(t["df"].to_numpy(zero_copy_only=False)))
    # every posting lands in exactly one (term, bucket) slice
    oracle_postings = sum(len(p) for p in oracle.postings.values())
    assert total_postings == oracle_postings


def test_termstats_df_match_oracle(built_index, oracle):
    # term dictionary = segment files; salted terms sum across slices
    ts = pads.dataset(built_index.termstats_dir()).to_table(
        columns=["term", "df"])
    df: dict = {}
    for t, d in zip(ts["term"].to_pylist(), ts["df"].to_pylist()):
        df[t] = df.get(t, 0) + d
    assert len(df) == len(oracle.postings)
    for t, p in oracle.postings.items():
        assert df[t] == len(p), t
    # hot-term manifest df is exact
    for t, h in built_index.hot_terms.items():
        assert h["df"] == len(oracle.postings[t])


def test_hot_terms_salted(built_index):
    # threshold was forced low in the fixture -> head terms must be salted
    assert len(built_index.hot_terms) > 0
    for t, h in built_index.hot_terms.items():
        assert h["n_salt"] >= 2
        assert h["df"] > 200


def test_hot_term_slices_disjoint_ordered(built_index, engine):
    """Doc-range salting: slices must be disjoint ascending doc ranges so
    the query side reassembles by concatenation."""
    term = max(built_index.hot_terms, key=lambda t: built_index.hot_terms[t]["df"])
    slices = engine._slices(term)
    assert len(slices) >= 2
    prev_hi = -1
    total = 0
    for seg, bucket in slices:
        r = engine._readers.reader(seg)
        got = r.postings(term, bucket)
        if got is None:
            continue
        d = got[0]
        assert d[0] > prev_hi
        prev_hi = int(d[-1])
        total += len(d)
    assert total == built_index.hot_terms[term]["df"]


def test_doc_table_columns(built_index):
    ds = pads.dataset(built_index.doc_table_dir())
    names = set(ds.schema.names)
    # dense-id layout: doc_id is implicit (base + row), not a column
    assert {"doc_len", "terms", "tfs", "lang", "warc_ts", "url"} <= names
    assert built_index.id_assignment == "dense"
    assert sum(n for _p, n in built_index.id_files) == built_index.num_docs


def test_doc_ids_unique(built_index):
    from icat_lucene_ray.query import Index

    ids = Index(built_index.root).all_doc_ids()
    assert len(np.unique(ids)) == len(ids) == built_index.num_docs
    # dense: exactly [0, N)
    assert ids.min() == 0 and ids.max() == built_index.num_docs - 1


def test_two_level_exchange_byte_identical(ray_session, tmp_path):
    """exchange_fanin small enough to force the intermediate combine
    level -> segment files byte-identical to the single-level exchange
    (the combine is an order-preserving concat)."""
    import os

    import pyarrow.parquet as pq

    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.corpus import write_pages
    from icat_lucene_ray.index.build import build_index

    pages = str(tmp_path / "pages")
    write_pages(pages, 300, rows_per_file=25, vocab_size=900)  # many files
    cfg1 = EngineConfig(num_segments=4, analyzed_rows_per_file=64)
    out1 = str(tmp_path / "idx1")
    build_index(pages, out1, meta_cols=["lang"], config=cfg1)
    cfg2 = EngineConfig(num_segments=4, analyzed_rows_per_file=64,
                        exchange_fanin=2)
    out2 = str(tmp_path / "idx2")
    m2 = build_index(pages, out2, meta_cols=["lang"], config=cfg2)
    assert m2.metrics.get("phase_c_combine_tasks", 0) > 0, \
        "fixture did not trigger the combine level"
    segs1 = sorted(os.listdir(os.path.join(out1, "segments")))
    segs2 = sorted(os.listdir(os.path.join(out2, "segments")))
    assert segs1 == segs2
    for s in segs1:
        t1 = pq.read_table(os.path.join(out1, "segments", s))
        t2 = pq.read_table(os.path.join(out2, "segments", s))
        assert t1.equals(t2), s


def test_compression_config_round_trip(ray_session, pages_dir, tmp_path):
    """segment_compression/analyzed_compression are honored on every
    write path and the index stays fully queryable (zstd here — the
    non-default — so a silent fallback to the default would fail)."""
    import pyarrow.parquet as pq

    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.index.modify import IndexUpdater
    from icat_lucene_ray.query import Index
    from icat_lucene_ray.query.ast import Term

    out = str(tmp_path / "zidx")
    cfg = EngineConfig(num_segments=2, segment_compression="zstd",
                       analyzed_compression="zstd")
    build_index(pages_dir, out, meta_cols=["lang"], config=cfg)

    def _codecs(path):
        md = pq.ParquetFile(path).metadata
        return {md.row_group(i).column(0).compression
                for i in range(md.num_row_groups)}

    idx = Index(out)
    seg0 = idx.manifest.segment_path(idx.manifest.segments[0]["seg_id"])
    assert _codecs(seg0) == {"ZSTD"}
    hits = idx.search(Term("data"), k=5)
    n0 = hits.total_hits

    # delta commit inherits the manifest's config
    up = IndexUpdater(out)
    up.create({"url": "zz://new", "text": "data data zstd roundtrip"})
    up.commit()
    idx2 = Index(out)
    assert idx2.search(Term("zstd"), k=5).total_hits == 1
    assert idx2.search(Term("data"), k=5).total_hits == n0 + 1
    delta_segs = [s for s in idx2.manifest.segments
                  if "seg" in s.get("seg_prefix", "seg")]
    assert delta_segs
