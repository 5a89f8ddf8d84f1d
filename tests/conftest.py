"""Session-scoped Ray + shared fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import glob
import logging
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    from icat_lucene_ray.corpus import write_pages

    d = tmp_path_factory.mktemp("corpus") / "pages"
    write_pages(str(d), 800, rows_per_file=200, vocab_size=5000)
    return str(d)


@pytest.fixture(scope="session")
def pages_table(pages_dir) -> pa.Table:
    return pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(f"{pages_dir}/*.parquet"))
    )


@pytest.fixture(scope="session")
def built_index(ray_session, pages_dir, tmp_path_factory):
    """One shared index build: salting forced on (low threshold) so hot
    terms exercise the doc-range-salted path."""
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = EngineConfig(
        num_segments=4, salt_df_threshold=200, target_slice_postings=200
    )
    manifest = build_index(
        pages_dir, out, meta_cols=["lang", "warc_ts"], config=cfg,
        checkpoint_shards=2,
    )
    return manifest


@pytest.fixture(scope="session")
def engine(built_index):
    from icat_lucene_ray.query import Index

    return Index(built_index.root)


@pytest.fixture(scope="session")
def oracle(pages_table, engine):
    from icat_lucene_ray.query import OracleIndex

    # dense ids are assigned by the build; take the url -> id map from
    # the engine's doc store so oracle and engine agree on identities
    t = engine._doc_store_table(columns=["url"])
    m = dict(zip(t["url"].to_pylist(), t["doc_id"].to_pylist()))
    ids = pa.array([m[u] for u in pages_table["url"].to_pylist()], pa.int64())
    tbl = pages_table.append_column("doc_id", ids)
    return OracleIndex(tbl, analyzer="icat", id_col="doc_id")
