"""End-to-end curation pipeline: scrub → dedup → decontaminate, with
stage-resume semantics (training-data surface; no reference parity)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from icat_lucene_ray.pipelines.curate import CurateConfig, curate

GOOD = ("the data pipeline joins the table scan with a filter stage "
        "and writes compact parquet output for later query passes")
DOCS = [
    (0, GOOD),
    (1, "x"),                                     # min_tokens drop
    (2, "the and of to in is that it an a"),      # all stopwords drop
    (3, "spam spam spam spam spam spam spam spam"),  # dup_word_frac drop
    (4, GOOD),                                    # exact dup of 0 -> drop
    (5, "contact me at alice@example.com for the merge plan today ok"),
    (6, "the quick brown fox jumps over the lazy dog every day"),
    (7, "benchmark question about the secret eval answer tokens here"),
]
BENCH = ["benchmark question about the secret eval answer tokens maybe"]


def _write_corpus(tmp_path):
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    }), src)
    return src


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("curate")
    src = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    cfg = CurateConfig(near_dup_threshold=0.8, decontam_n=5)
    report = curate(src, out, bench=BENCH, cfg=cfg)
    return src, out, cfg, report


def test_stage_counts(run):
    _, out, _, report = run
    assert report["input_rows"] == 8
    # drops: 1 (short), 2 (stopwords), 3 (repetition) at scrub
    assert report["stages"]["scrub"]["rows"] == 5
    # doc 4 is an exact dup of doc 0
    assert report["stages"]["dedup"]["rows"] == 4
    # doc 7 shares a 5-gram with the benchmark
    assert report["curated_rows"] == 3
    final = pq.read_table(os.path.join(out, "curated"))
    assert sorted(final["doc_id"].to_pylist()) == [0, 5, 6]


def test_pii_redacted_and_metrics_present(run):
    _, out, _, _ = run
    final = pq.read_table(os.path.join(out, "curated")).to_pandas() \
        .set_index("doc_id")
    assert "<EMAIL>" in final.loc[5, "text"]
    assert "alice@example.com" not in final.loc[5, "text"]
    for col in ("n_tokens", "stop_ratio", "quality", "dup_word_frac",
                "top_bigram_frac", "lang_pred", "n_pii"):
        assert col in final.columns, col
    assert final.loc[5, "n_pii"] == 1


def test_report_written(run):
    _, out, _, report = run
    on_disk = json.load(open(os.path.join(out, "report.json")))
    assert on_disk == report


def test_resume_skips_finished_stages(run):
    src, out, cfg, report = run

    def mtimes():
        out_files = {}
        for root, _, files in os.walk(out):
            for f in files:
                p = os.path.join(root, f)
                out_files[p] = os.stat(p).st_mtime_ns
        return out_files

    before = mtimes()
    report2 = curate(src, out, bench=BENCH, cfg=cfg)
    after = mtimes()
    # same row counts, and no stage output rewritten (only report.json
    # may be touched)
    assert report2["curated_rows"] == report["curated_rows"]
    changed = {p for p in before
               if before[p] != after.get(p) and "report.json" not in p}
    assert not changed, changed


def test_no_bench_keeps_contaminated(ray_session, tmp_path):
    src = _write_corpus(tmp_path)
    out = str(tmp_path / "out_nobench")
    report = curate(src, out, bench=None,
                    cfg=CurateConfig(near_dup_threshold=None))
    # scrub drops 3; exact dedup still removes the doc-0 duplicate
    assert report["curated_rows"] == 4


def test_resume_after_midstage_crash(ray_session, tmp_path):
    """Partial parquet files left by a crashed stage (present dir, no
    _DONE.json) must not duplicate rows on rerun: the stage dir is
    cleared before the rewrite."""
    src = _write_corpus(tmp_path)
    out = str(tmp_path / "out_crash")
    scrubbed = os.path.join(out, "scrubbed")
    os.makedirs(scrubbed)
    pq.write_table(pa.table({
        "doc_id": pa.array([999], pa.int64()),
        "text": pa.array(["stale partial row"], pa.string())}),
        os.path.join(scrubbed, "partial.parquet"))
    report = curate(src, out, bench=BENCH,
                    cfg=CurateConfig(near_dup_threshold=0.8, decontam_n=5))
    assert report["stages"]["scrub"]["rows"] == 5  # not 6: stale file gone
    final = pq.read_table(os.path.join(out, "curated"))
    assert sorted(final["doc_id"].to_pylist()) == [0, 5, 6]


def test_dedup_transform_anti_join_paths(ray_session, tmp_path):
    """The exact-dedup pair shuffle must produce identical survivors
    through BOTH drop-set anti-filter paths: broadcast (drops below
    driver_cap) and the bucketed distributed anti-join (driver_cap=0
    forces it) — the path a 100-TB corpus would take. The corpus
    payload itself never enters the exchange in either path."""
    from icat_lucene_ray.pipelines.curate import dedup_transform

    n = 40
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        # 10 distinct texts, each duplicated 4x -> keep lowest id each
        "text": pa.array([f"unique document text number {i % 10} "
                          f"with enough tokens to keep" for i in range(n)]),
    })
    cfg = CurateConfig(near_dup_threshold=None)
    ds = ray.data.from_arrow(tbl)
    via_broadcast = dedup_transform(ds, cfg).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    via_anti_join = dedup_transform(
        ray.data.from_arrow(tbl), cfg, left_rows=n, driver_cap=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert via_broadcast["doc_id"].tolist() == list(range(10))
    assert via_broadcast.equals(via_anti_join)


def test_string_id_near_dup(ray_session, tmp_path):
    """CC-style url-keyed corpora (no int id) run the full near-dup
    stage: string keys hash to stable 63-bit ids internally, the output
    keeps the original key column and drops the helper."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta " * 5,
        "alpha beta gamma delta epsilon zeta eta theta " * 5 + "tail",
        "completely different words in this one document here now",
    ]
    src = str(tmp_path / "urls.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"https://h{i}.example/p" for i in range(3)]),
        "text": pa.array(texts, pa.string())}), src)
    out = str(tmp_path / "out_url")
    report = curate(src, out, bench=None,
                    cfg=CurateConfig(id_col="url", min_tokens=3,
                                     near_dup_threshold=0.8))
    final = pq.read_table(os.path.join(out, "curated"))
    assert sorted(final.column_names) == ["fp_md5", "text", "url"] or \
        "url" in final.column_names and "_nid64" not in final.column_names
    # the two near-identical docs collapse to one survivor
    assert report["curated_rows"] == 2
