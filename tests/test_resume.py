"""Checkpoint/resume — FIXTURES.md §4: completed shards are not
recomputed; changed input invalidates the lineage and rebuilds."""

import glob
import json
import os
import shutil

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.corpus import write_pages
from icat_lucene_ray.index.build import build_index


def test_resume_skips_done_shards(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(pages, 200, rows_per_file=50, vocab_size=1000)
    out = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2)

    m1 = build_index(pages, out, meta_cols=["lang"], config=cfg,
                     checkpoint_shards=4)
    assert m1.metrics["phase_a_shards_skipped"] == 0

    m2 = build_index(pages, out, meta_cols=["lang"], config=cfg,
                     checkpoint_shards=4, resume=True)
    assert m2.metrics["phase_a_shards_skipped"] == 4
    assert m2.num_docs == m1.num_docs
    assert m2.segments == m1.segments


def test_resume_after_partial_failure(ray_session, tmp_path):
    """Simulate a crash after shard 0: delete shard 1+ markers, resume,
    and verify the final index equals a clean build's stats."""
    pages = str(tmp_path / "pages")
    write_pages(pages, 200, rows_per_file=50, vocab_size=1000)
    out = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2)
    m1 = build_index(pages, out, meta_cols=["lang"], config=cfg,
                     checkpoint_shards=4)

    # wipe two shards (as if they never completed)
    shards = sorted(glob.glob(os.path.join(out, "analyzed", "shard_*")))
    for s in shards[2:]:
        shutil.rmtree(s)
    m2 = build_index(pages, out, meta_cols=["lang"], config=cfg,
                     checkpoint_shards=4, resume=True)
    assert m2.metrics["phase_a_shards_skipped"] == 2
    assert m2.num_docs == m1.num_docs
    assert m2.segments == m1.segments


def test_changed_input_invalidates_lineage(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(pages, 120, rows_per_file=60, vocab_size=1000)
    out = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2)
    build_index(pages, out, meta_cols=["lang"], config=cfg,
                checkpoint_shards=2)

    # regenerate input with one more file: the shard that now contains the
    # new file has different lineage and rebuilds; the shard whose file
    # list is byte-identical legitimately skips
    write_pages(pages, 180, rows_per_file=60, vocab_size=1000)
    m2 = build_index(pages, out, meta_cols=["lang"], config=cfg,
                     checkpoint_shards=2, resume=True)
    assert m2.metrics["phase_a_shards_skipped"] == 1
    assert m2.num_docs == 180


def test_marker_contents(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(pages, 60, rows_per_file=60, vocab_size=500)
    out = str(tmp_path / "idx")
    build_index(pages, out, config=EngineConfig(num_segments=2),
                checkpoint_shards=1)
    marker = os.path.join(out, "analyzed", "shard_00000", "_DONE.json")
    with open(marker) as f:
        d = json.load(f)
    assert "lineage" in d and d["files"]


def test_segment_write_idempotent_on_retry(ray_session, tmp_path):
    """A retried write (actor restart mid-build) must reproduce the
    byte-identical segment: write twice, compare artifacts."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from icat_lucene_ray.index.build import SegmentWriter

    rng = np.random.default_rng(3)
    rows = {"skey": [], "term": [], "bucket": [], "docs": [], "tf": [],
            "dl": []}
    for t in range(50):
        docs = np.sort(rng.choice(5000, size=20, replace=False))
        rows["skey"].append(1)
        rows["term"].append(f"t{t:03d}")
        rows["bucket"].append(0)
        rows["docs"].append(docs.tolist())
        rows["tf"].append(rng.integers(1, 5, 20).tolist())
        rows["dl"].append(rng.integers(50, 300, 20).tolist())
    tbl = pa.table({
        "skey": pa.array(rows["skey"], pa.int32()),
        "term": pa.array(rows["term"]),
        "bucket": pa.array(rows["bucket"], pa.int32()),
        "docs": pa.array(rows["docs"], pa.list_(pa.int64())),
        "tf": pa.array(rows["tf"], pa.list_(pa.int32())),
        "dl": pa.array(rows["dl"], pa.list_(pa.int32())),
    })
    d = tmp_path / "retry"
    (d / "segments").mkdir(parents=True)
    w = SegmentWriter(str(d), 1.2, 0.75, 150.0, 128)
    p = d / "segments" / "seg_00001.parquet"
    stats1 = w(tbl)
    h1 = hashlib.md5(p.read_bytes()).hexdigest()
    stats2 = w(tbl)  # the retry
    h2 = hashlib.md5(p.read_bytes()).hexdigest()
    assert h1 == h2
    assert stats1.equals(stats2)
