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


class FacetShard:
    """One doc-range slice of the facet state, resident in a SERVING
    ACTOR — the cluster form of ST2 (the reference's per-shard
    ``DefaultSortedSetDocValuesReaderState``, ``Lucene.java:182-198``,
    is likewise per-shard state next to the shard's reader). Each
    SegmentActor owns a subset of shards; the driver only ever sees
    merged ≤max_labels label-count dicts, never the O(N) forward
    arrays.

    A shard maps to one base doc-store file. It loads its sidecar part
    when one exists, else reads the pruned meta columns from the base
    file directly; ad-hoc facet columns outside the sidecar are fetched
    from the base file on demand. All state is cached for the actor's
    lifetime."""

    def __init__(self, part_path: str | None, base_file: str,
                 id_base: int | None, meta_cols: list[str]):
        self.part_path = part_path
        self.base_file = base_file
        self.id_base = id_base  # None => explicit doc_id column
        self.meta_cols = list(meta_cols)
        self._tbl: pa.Table | None = None
        self._ids: np.ndarray | None = None
        self._perm: pa.Array | None = None  # explicit-mode sort order
        self._string: dict[str, tuple[np.ndarray, list]] = {}
        self._numeric: dict[str, np.ndarray] = {}

    def _load(self):
        if self._tbl is not None:
            return
        if self.part_path is not None and os.path.exists(self.part_path):
            t = pq.read_table(self.part_path)
        else:
            cols = (self.meta_cols if self.id_base is not None
                    else ["doc_id"] + self.meta_cols)
            t = pq.read_table(self.base_file,
                              columns=[c for c in cols if c])
            if self.id_base is not None:
                t = t.add_column(0, "doc_id", pa.array(
                    np.arange(self.id_base, self.id_base + t.num_rows),
                    pa.int64()))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) > 1 and np.any(ids[1:] < ids[:-1]):
            self._perm = pa.compute.sort_indices(
                t, sort_keys=[("doc_id", "ascending")])
            t = t.take(self._perm)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
        self._tbl = t
        self._ids = ids

    def _column(self, col: str):
        self._load()
        if col not in self._tbl.column_names:
            extra = pq.read_table(self.base_file, columns=[col])[col]
            if self._perm is not None:
                extra = extra.take(self._perm)
            self._tbl = self._tbl.append_column(col, extra)
        return self._tbl[col]

    def _select(self, cand: np.ndarray | None,
                exclude: np.ndarray | None = None) -> np.ndarray:
        """Row positions of this shard's rows whose doc_id ∈ cand (both
        sides sorted ascending). ``cand=None`` selects ALL rows except
        the (small) sorted ``exclude`` set — the MatchAll path, which
        never materializes a candidate id universe."""
        ids = self._ids
        if cand is None:
            if exclude is None or len(exclude) == 0:
                return np.arange(len(ids), dtype=np.int64)
            mask = np.ones(len(ids), dtype=bool)
            if len(ids):
                pos = np.minimum(np.searchsorted(ids, exclude), len(ids) - 1)
                hit = ids[pos] == exclude
                mask[pos[hit]] = False
            return np.flatnonzero(mask)
        if len(ids) == 0 or len(cand) == 0:
            return np.empty(0, np.int64)
        lo = np.searchsorted(cand, ids[0])
        hi = np.searchsorted(cand, ids[-1], side="right")
        sub = cand[lo:hi]
        if len(sub) == 0:
            return np.empty(0, np.int64)
        if self.id_base is not None:
            return sub - ids[0]  # dense contiguous range: all present
        pos = np.searchsorted(ids, sub)
        pos = np.minimum(pos, len(ids) - 1)
        return pos[ids[pos] == sub]

    def count_into(self, cand: np.ndarray | None, dims: list[str],
                   ranges: dict, counters: dict, range_counts: dict,
                   exclude: np.ndarray | None = None):
        """Accumulate this shard's label / range counts for the
        candidate docs into the (small) output dicts."""
        self._load()
        sel = self._select(cand, exclude)
        if not len(sel):
            return
        for d in dims:
            got = self._string.get(d)
            if got is None:
                arr = self._column(d).combine_chunks()
                if not pa.types.is_dictionary(arr.type):
                    arr = arr.dictionary_encode()
                idx_arr = arr.indices
                if idx_arr.null_count:
                    idx_arr = pa.compute.fill_null(idx_arr, -1)
                got = self._string[d] = (
                    idx_arr.to_numpy(zero_copy_only=False).astype(np.int64),
                    arr.dictionary.to_pylist())
            codes, labels = got
            cs = codes[sel]
            cs = cs[cs >= 0]
            bc = np.bincount(cs, minlength=len(labels))
            c = counters[d]
            for li in np.flatnonzero(bc):
                c[labels[li]] = c.get(labels[li], 0) + int(bc[li])
        for f, rs in ranges.items():
            vals = self._numeric.get(f)
            if vals is None:
                arr = self._column(f)
                if pa.types.is_timestamp(arr.type):
                    arr = arr.cast(pa.int64())
                vals = self._numeric[f] = arr.to_numpy(zero_copy_only=False)
            v = vals[sel]
            for i, (_label, lo, hi) in enumerate(rs):
                range_counts[f][i] += int(
                    np.count_nonzero((v >= lo) & (v < hi)))


class FacetState:
    """Loaded (or lazily built) per-index facet forward arrays
    (single-process serving path; actor-mode serving shards this state
    across the SegmentActor pool as :class:`FacetShard` instances)."""

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
            # one threaded scan across all parts — serial per-file
            # read_table was the bulk of facet_first_ms on wide indexes
            import pyarrow.dataset as pads

            t = pads.dataset(parts, format="parquet").to_table()
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
