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

SIDECAR_DIR = "facets"
SIDECAR = "facets/sidecar.parquet"  # legacy single-file layout (read-only)


def sidecar_path(root: str) -> str:
    return os.path.join(root, SIDECAR)


def write_sidecar(root: str) -> str | None:
    """Build the facet sidecar for the base (gen-0) doc store: one Ray
    task per doc-store file writes an id-ordered (doc_id + meta cols)
    part — the DRIVER never materializes the corpus metadata (at 10^12
    docs that would be a driver OOM); the serving node loads the parts
    once into its cached facet state. Returns the sidecar dir, or None
    when the index has no metadata columns."""
    import ray

    from icat_lucene_ray.index.manifest import IndexManifest

    m = IndexManifest.load(root)
    if not m.meta_cols:
        return None
    out_dir = os.path.join(root, SIDECAR_DIR)
    os.makedirs(out_dir, exist_ok=True)
    dense = getattr(m, "id_assignment", "explicit") == "dense"
    if dense:
        files = []
        base = 0
        for rel, n in m.id_files:
            files.append((os.path.join(root, rel), base))
            base += n
    else:
        doc_root = m.doc_table_dir()
        files = [(os.path.join(r, f), None)
                 for top in sorted(os.listdir(doc_root))
                 if not top.startswith("delta_")
                 for r, _d, fs in os.walk(os.path.join(doc_root, top))
                 for f in sorted(fs) if f.endswith(".parquet")]

    @ray.remote
    def _part(path: str, id_base, cols: list[str], out_path: str):
        import numpy as np  # noqa: F811

        read_cols = cols if id_base is not None else ["doc_id"] + cols
        t = pq.read_table(path, columns=read_cols)
        if id_base is not None:
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(id_base, id_base + t.num_rows), pa.int64()))
        tmp = out_path + ".tmp"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, out_path)
        return out_path

    cols = list(m.meta_cols)
    refs = [
        _part.remote(path, base, cols,
                     os.path.join(out_dir, f"part_{i:05d}.parquet"))
        for i, (path, base) in enumerate(files)
    ]
    ray.get(refs)
    return out_dir


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
        root = self._idx.manifest.root
        sc_dir = os.path.join(root, SIDECAR_DIR)
        parts = sorted(
            os.path.join(sc_dir, f) for f in os.listdir(sc_dir)
            if f.endswith(".parquet")) if os.path.isdir(sc_dir) else []
        if parts:
            t = pa.concat_tables([pq.read_table(p) for p in parts])
        else:
            # older index / merged output: build the state in memory once
            m = self._idx.manifest
            t = self._idx._base_table(["doc_id"] + list(m.meta_cols))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) > 1 and np.any(ids[1:] < ids[:-1]):
            t = t.take(pa.compute.sort_indices(
                t, sort_keys=[("doc_id", "ascending")]))
        self._tbl = t
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
