"""Flagship pipeline + per-sf-dir index cache.

``flagship(sf_dir)``: build (or reuse) an inverted index over the
``documents`` table, run a representative BM25 search, and return the
hit table — read → tokenize → shuffle → segments → query, end to end.

The index cache keys on the input's lineage (file sizes + config), so
repeated ``queries()`` calls against the same sf_dir build once.
"""

from __future__ import annotations

import hashlib
import os

from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.index.build import build_index, _input_files, _lineage
from icat_lucene_ray.index.manifest import IndexManifest
from icat_lucene_ray.query import Index, Term

_CACHE_ROOT = "/tmp/icat_lucene_ray_cache"

#: documents-table indexing profile: simple analyzer (lowercase
#: whitespace split — SQL-oracle-mirrorable), metadata kept for
#: filters/sort/facets
DOC_CONFIG = EngineConfig(analyzer="simple", num_segments=8)
DOC_META = ["lang", "source", "n_chars"]

_INDEX_CACHE: dict[str, Index] = {}


def get_cached_index(sf_dir: str) -> Index:
    """Build-once index over ``{sf_dir}/documents.parquet``."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.blake2b(
        _lineage(_input_files(src), DOC_CONFIG, "docs-v1").encode(),
        digest_size=8,
    ).hexdigest()
    hit = _INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    out = os.path.join(_CACHE_ROOT, f"docs_{key}")
    try:
        m = IndexManifest.load(out)
        fresh = m.lineage.get("input") == _lineage(
            _input_files(src), DOC_CONFIG, DOC_CONFIG.analyzer)
    except Exception:
        fresh = False
    if not fresh:
        build_index(
            src, out,
            text_col="text", id_col="doc_id", meta_cols=DOC_META,
            config=DOC_CONFIG,
        )
    idx = Index(out)
    _INDEX_CACHE[key] = idx
    return idx


#: positional profile (Q4): same simple analyzer, positions indexed so
#: Phrase means true adjacency (SQL-mirrorable via zipped unnest + self
#: join on pos+1)
POS_CONFIG = EngineConfig(analyzer="simple", num_segments=8, positions=True)
_POS_CACHE: dict[str, Index] = {}


def get_cached_positional_index(sf_dir: str) -> Index:
    """Build-once positional index over ``{sf_dir}/documents.parquet``."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.blake2b(
        _lineage(_input_files(src), POS_CONFIG, "pos-v1").encode(),
        digest_size=8,
    ).hexdigest()
    hit = _POS_CACHE.get(key)
    if hit is not None:
        return hit
    out = os.path.join(_CACHE_ROOT, f"pidx_{key}")
    try:
        m = IndexManifest.load(out)
        fresh = m.lineage.get("input") == _lineage(
            _input_files(src), POS_CONFIG, POS_CONFIG.analyzer)
    except Exception:
        fresh = False
    if not fresh:
        build_index(src, out, text_col="text", id_col="doc_id",
                    meta_cols=DOC_META, config=POS_CONFIG)
    idx = Index(out)
    _POS_CACHE[key] = idx
    return idx


#: multi-field profile (M2): title = first 8 tokens of the body —
#: SQL-mirrorable (string_split(text,' ')[1:8]) so the DuckDB oracle can
#: score the same two fields independently
MF_CONFIG = EngineConfig(analyzer="simple", num_segments=8)
_MF_CACHE: dict[str, Index] = {}


def _add_title_batch(b):
    import pyarrow.compute as pc

    toks = pc.list_slice(pc.split_pattern(b["text"], pattern=" "), 0, 8)
    return b.append_column("title", pc.binary_join(toks, " "))


def get_cached_multifield_index(sf_dir: str) -> Index:
    """Build-once 2-field index (title, text) over the documents table.
    The derived title column is written by a Ray Data pass (streaming;
    the derivation scales with the corpus), then indexed with
    field-prefixed terms and per-field BM25 stats."""
    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.blake2b(
        _lineage(_input_files(src), MF_CONFIG, "mf-v1").encode(),
        digest_size=8,
    ).hexdigest()
    hit = _MF_CACHE.get(key)
    if hit is not None:
        return hit
    derived = os.path.join(_CACHE_ROOT, f"mfsrc_{key}")
    out = os.path.join(_CACHE_ROOT, f"mfidx_{key}")
    try:
        m = IndexManifest.load(out)
        fresh = m.lineage.get("derived_from") == key
    except Exception:
        fresh = False
    if not fresh:
        os.makedirs(derived, exist_ok=True)
        (ray.data.read_parquet(src, columns=["doc_id", "text"])
         .map_batches(_add_title_batch, batch_format="pyarrow")
         .write_parquet(derived))
        m = build_index(derived, out, text_cols=["title", "text"],
                        id_col="doc_id", config=MF_CONFIG)
        m.lineage["derived_from"] = key
        m.save()
    idx = Index(out)
    _MF_CACHE[key] = idx
    return idx


def flagship(sf_dir: str = "/root/testdata/sf0.001"):
    """Build index over documents and run a scored search with a
    language filter — exercises source, analysis, shuffle, segment,
    scoring and doc-store paths."""
    idx = get_cached_index(sf_dir)
    r = idx.search(Term("data"), k=20, fields=["lang", "n_chars"])
    return r.table
