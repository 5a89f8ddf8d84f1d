"""Facet sidecar — the cached facet state (ST2).

The reference keeps per-shard ``DefaultSortedSetDocValuesReaderState``
alive between queries (``Lucene.java:182-198``, ``FacetsConfig``); the
equivalent here is a doc-id-ordered forward index ("doc values") of the
facetable metadata columns: dictionary-encoded codes for string dims,
raw numerics for range facets. Counting a facet for a query is then

    counts = bincount(codes[rank_of(candidate_docs)])

— O(|candidates|) per query instead of a full doc-store scan. The
sidecar is written once at build time (one pruned column scan) and
loaded lazily; if the file is absent (older index, post-merge) the same
state is built in memory on first use and cached.

Delta-generation documents (incremental commits) are NOT in the
sidecar; the query path counts those from the (small) delta doc stores
and merges.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SIDECAR = "facets/sidecar.parquet"


def sidecar_path(root: str) -> str:
    return os.path.join(root, SIDECAR)


def write_sidecar(root: str) -> str | None:
    """Build the facet sidecar for the base (gen-0) doc store. Returns
    the path, or None when the index has no metadata columns."""
    from icat_lucene_ray.query.engine import Index

    idx = Index(root)
    m = idx.manifest
    if not m.meta_cols:
        return None
    t = idx._doc_store_table(columns=["doc_id"] + list(m.meta_cols))
    order = pa.compute.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    t = t.take(order)
    cols: dict = {"doc_id": t["doc_id"]}
    for c in m.meta_cols:
        arr = t[c].combine_chunks()
        if pa.types.is_string(arr.type):
            arr = arr.dictionary_encode()
        cols[c] = arr
    path = sidecar_path(root)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.table(cols), tmp, compression="zstd")
    os.replace(tmp, path)
    return path


class FacetState:
    """Loaded (or lazily built) per-index facet forward arrays."""

    def __init__(self, index):
        self._idx = index
        self._tbl: pa.Table | None = None
        self._string: dict[str, tuple[np.ndarray, list]] = {}
        self._numeric: dict[str, np.ndarray] = {}
        self._ids: np.ndarray | None = None

    def _load(self):
        if self._tbl is not None:
            return
        path = sidecar_path(self._idx.manifest.root)
        if os.path.exists(path):
            self._tbl = pq.read_table(path)
        else:
            # older index / merged output: build the state in memory once
            m = self._idx.manifest
            t = self._idx._base_table(["doc_id"] + list(m.meta_cols))
            order = pa.compute.sort_indices(
                t, sort_keys=[("doc_id", "ascending")])
            self._tbl = t.take(order)
        self._ids = self._tbl["doc_id"].to_numpy(zero_copy_only=False)

    def ids(self) -> np.ndarray:
        self._load()
        return self._ids

    def _column(self, col: str):
        """Sidecar column; columns outside the sidecar (ad-hoc facet
        fields like doc_len) are fetched from the base doc store once
        and appended — same doc-id order, cached thereafter."""
        self._load()
        if col not in self._tbl.column_names:
            t = self._idx._base_table(["doc_id", col])
            order = pa.compute.sort_indices(
                t, sort_keys=[("doc_id", "ascending")])
            self._tbl = self._tbl.append_column(col, t.take(order)[col])
        return self._tbl[col]

    def string_dim(self, col: str) -> tuple[np.ndarray, list]:
        """(codes int64 in doc-id order, dictionary labels)."""
        got = self._string.get(col)
        if got is None:
            arr = self._column(col).combine_chunks()
            if not pa.types.is_dictionary(arr.type):
                arr = arr.dictionary_encode()
            idx_arr = arr.indices
            if idx_arr.null_count:
                idx_arr = pa.compute.fill_null(idx_arr, -1)
            codes = idx_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            labels = arr.dictionary.to_pylist()
            got = self._string[col] = (codes, labels)
        return got

    def numeric_dim(self, col: str) -> np.ndarray:
        got = self._numeric.get(col)
        if got is None:
            arr = self._column(col)
            if pa.types.is_timestamp(arr.type):
                arr = arr.cast(pa.int64())
            got = self._numeric[col] = arr.to_numpy(zero_copy_only=False)
        return got
