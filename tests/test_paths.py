"""Path-field semantics — mirrors the reference's testLocationFields
(TestLucene.java:363-412): fixture paths with exact hit counts across
the three path tokenizations (location / location.exact /
location.fileName ≈ analyzers path / path_hierarchy / filename)."""

import pyarrow as pa
import pytest

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.index.build import build_index
from icat_lucene_ray.query import Index, Term, Wildcard

# ≈ the reference's four fixture paths (TestLucene.java:367-373)
PATHS = [
    "/dir/TOPDIR/subdir/file.txt",
    "/dir/TOPDIR/subdir/file2.TXT",
    "/dir/other/File.txt",
    "/dir2/file.txt",
]


def test_path_analyzer_tokens():
    an = get_analyzer("path")
    assert an.tokens("/dir/TOPDIR/subdir/file.txt") == \
        ["dir", "topdir", "subdir", "file.txt"]


def test_path_hierarchy_tokens_case_sensitive():
    an = get_analyzer("path_hierarchy")
    assert an.tokens("/dir/TOPDIR/sub") == ["/dir", "/dir/TOPDIR",
                                            "/dir/TOPDIR/sub"]


def test_filename_tokens():
    an = get_analyzer("filename")
    assert an.tokens("/a/b/report.final.PDF") == ["report", "final", "pdf"]


@pytest.fixture(scope="module")
def path_indexes(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("pidx")
    src = str(root / "src")
    import os

    import pyarrow.parquet as pq

    os.makedirs(src)
    t = pa.table({"url": pa.array([f"u{i}" for i in range(len(PATHS))]),
                  "text": pa.array(PATHS)})
    pq.write_table(t, os.path.join(src, "part.parquet"))
    out = {}
    for an in ("path", "path_hierarchy", "filename"):
        d = str(root / an)
        build_index(src, d, analyzer=an, config=EngineConfig(num_segments=2))
        out[an] = Index(d)
    return out


def test_location_split_hits(path_indexes):
    idx = path_indexes["path"]
    # 'topdir' segment matches both TOPDIR docs, case-insensitively
    assert idx.count(Term("TOPDIR")) == 2
    assert idx.count(Term("dir")) == 3          # not /dir2
    assert idx.count(Term("file.txt")) == 3     # File.txt lowercases too
    assert idx.count(Term("missing")) == 0


def test_location_exact_prefix_hits(path_indexes):
    idx = path_indexes["path_hierarchy"]
    assert idx.count(Term("/dir")) == 3
    assert idx.count(Term("/dir/TOPDIR")) == 2
    # case-sensitive: lowercase prefix matches nothing
    assert idx.count(Term("/dir/topdir")) == 0
    assert idx.count(Term("/dir/TOPDIR/subdir/file.txt")) == 1
    # wildcard keeps case (reference skips lowercasing for .exact)
    assert idx.count(Wildcard("/dir/TOPDIR/*")) >= 2


def test_filename_hits(path_indexes):
    idx = path_indexes["filename"]
    assert idx.count(Term("file")) == 3   # file.txt ×2 (case-insens) + File.txt
    assert idx.count(Term("txt")) == 4
    assert idx.count(Term("file2")) == 1
