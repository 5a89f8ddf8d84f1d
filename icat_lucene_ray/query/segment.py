"""Segment readers — the stateful query-side store.

``SegmentReader`` ≈ one Lucene shard's ``SearcherManager`` state
(``Lucene.java:148,167-168``): opens an immutable segment file once,
keeps the term dictionary in memory, caches decoded postings. Used
directly for inline (driver-side) search and wrapped in a Ray actor
(:class:`SegmentActor`) for the serving path, where each actor owns a
subset of segments and scores terms locally so only (doc_id, score)
pairs cross the wire.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

from icat_lucene_ray.index.codec import decode_u64_blocks, tf_norm


#: decode-volume counters (values decoded), for tests/bench evidence
#: that pruning actually skips work. Reset with ``reset_decode_stats``.
DECODE_STATS = {"postings": 0, "blocks": 0}


def reset_decode_stats() -> None:
    DECODE_STATS["postings"] = 0
    DECODE_STATS["blocks"] = 0


class SegmentReader:
    """Reader over one immutable segment parquet file."""

    def __init__(self, path: str, codec_block: int = 128, cache_terms: int = 4096):
        self.path = path
        self.block = codec_block
        # Open metadata + skip data eagerly (small); the heavy posting
        # payload columns load lazily on the first decode — keeps
        # cold-open latency low for term-dictionary / df lookups.
        t = pq.read_table(path, columns=["term", "bucket", "df",
                                         "block_last", "block_max"])
        self._meta_tbl = t
        self._payload: pq.ParquetFile | None = None
        self._rg_cache: dict[int, object] = {}
        self._rg_bounds: np.ndarray | None = None
        self._cache: OrderedDict[tuple[str, int], tuple] = OrderedDict()
        self._cache_cap = cache_terms
        # term dictionary: (term, bucket) -> row
        terms = t["term"].to_pylist()
        buckets = t["bucket"].to_pylist()
        self._rows: dict[tuple[str, int], int] = {
            (tm, b): i for i, (tm, b) in enumerate(zip(terms, buckets))
        }
        self._df: dict[tuple[str, int], int] = dict(
            zip(self._rows.keys(), t["df"].to_pylist())
        )

    def _cell(self, col: str, row: int):
        """Payload cell access via per-row-group reads: only the row
        group holding ``row`` is read (and cached), so a cold lookup
        costs ~1 row group of the docs/tfs/dls[/poss] columns, not the
        whole segment."""
        if self._payload is None:
            self._payload = pq.ParquetFile(self.path)
            md = self._payload.metadata
            bounds = np.zeros(md.num_row_groups + 1, dtype=np.int64)
            for i in range(md.num_row_groups):
                bounds[i + 1] = bounds[i] + md.row_group(i).num_rows
            self._rg_bounds = bounds
            self._payload_cols = ["docs", "tfs", "dls"]
            if "poss" in self._payload.schema_arrow.names:
                self._payload_cols.append("poss")
        rg = int(np.searchsorted(self._rg_bounds, row, side="right") - 1)
        t = self._rg_cache.get(rg)
        if t is None:
            t = self._payload.read_row_group(rg, columns=self._payload_cols)
            self._rg_cache[rg] = t
        return {c: t[c][row - int(self._rg_bounds[rg])].as_py()
                for c in self._payload_cols}

    # ------------------------------------------------------------------
    def df(self, term: str, bucket: int = 0) -> int:
        return self._df.get((term, bucket), 0)

    def terms(self) -> list[tuple[str, int]]:
        return list(self._rows.keys())

    def postings(self, term: str, bucket: int = 0):
        """-> (doc_ids int64 sorted, tfs, dls) or None if absent."""
        key = (term, bucket)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        row = self._rows.get(key)
        if row is None:
            return None
        DECODE_STATS["postings"] += int(self._df.get(key, 0))
        cell = self._cell("docs", row)
        docs = decode_u64_blocks(cell["docs"], self.block)
        doc_ids = np.cumsum(docs.astype(np.int64))
        tfs = decode_u64_blocks(cell["tfs"], self.block).astype(np.int64)
        dls = decode_u64_blocks(cell["dls"], self.block).astype(np.int64)
        out = (doc_ids, tfs, dls)
        self._cache[key] = out
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)
        return out

    def positions(self, term: str, bucket: int = 0) -> np.ndarray | None:
        """Flat occurrence positions of one term slice (Q4), grouped per
        posting in doc order — slice by the tf prefix sums from
        :meth:`postings`. None if the index has no positional stream."""
        row = self._rows.get((term, bucket))
        if row is None:
            return None
        cell = self._cell("poss", row)
        if "poss" not in cell:
            return None
        return decode_u64_blocks(cell["poss"], self.block).astype(np.int64)

    def term_positions_for(self, term: str, bucket: int,
                           cand: np.ndarray | None):
        """(doc_rep, positions) per occurrence of the term slice,
        restricted to the sorted candidate doc ids (None = all docs).
        Runs segment-local so only matching occurrences leave the
        reader (the actor-pool phrase path)."""
        got = self.postings(term, bucket)
        if got is None:
            return None
        d, tf, _dl = got
        pos = self.positions(term, bucket)
        if pos is None:
            raise ValueError(
                "index has no positional stream (build with "
                "EngineConfig(positions=True))")
        tf64 = tf.astype(np.int64)
        if cand is not None:
            idx = np.minimum(np.searchsorted(cand, d),
                             max(0, len(cand) - 1))
            hit = (cand[idx] == d) if len(cand) else \
                np.zeros(len(d), dtype=bool)
            if not hit.any():
                return None
            sel = np.flatnonzero(hit)
        else:
            sel = np.arange(len(d))
        pstart = np.zeros(len(tf64) + 1, dtype=np.int64)
        np.cumsum(tf64, out=pstart[1:])
        total = int(tf64[sel].sum())
        from icat_lucene_ray.index.codec import concat_ranges

        g = concat_ranges(pstart[:-1][sel], tf64[sel],
                          np.empty(total, np.int64))
        return np.repeat(d[sel], tf64[sel]), pos[g]

    def block_meta(self, term: str, bucket: int = 0):
        """-> (block_last u64[], block_max f32[]) skip/WAND metadata."""
        row = self._rows.get((term, bucket))
        if row is None:
            return None
        tb = self._meta_tbl
        return (
            np.frombuffer(tb["block_last"][row].as_py(), dtype=np.uint64),
            np.frombuffer(tb["block_max"][row].as_py(), dtype=np.float32),
        )

    def score_blocks(
        self, term: str, bucket: int, idf: float,
        k1: float, b: float, avgdl: float,
        sel_blocks: np.ndarray,
    ):
        """Decode and score ONLY the selected posting blocks.

        Doc ids are reconstructed per block without a full delta cumsum:
        each block restarts from the previous block's ``block_last``
        (the skip entry), so decode cost is proportional to the selected
        blocks — the block-max WAND read path."""
        key = (term, bucket)
        row = self._rows.get(key)
        if row is None or len(sel_blocks) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        idxs = np.sort(np.asarray(sel_blocks, dtype=np.int64))
        return self._score_selected_blocks(key, row, idxs, idf, k1, b, avgdl)

    def _score_selected_blocks(self, key, row, idxs, idf, k1, b, avgdl):
        """Decode + score ONLY blocks ``idxs`` (sorted ascending): doc
        ids are reconstructed per block by restarting the delta cumsum
        from the previous block's ``block_last`` skip entry, so decode
        cost is O(selected blocks) — shared by the block-max WAND read
        path and the conjunction doc-range skip path."""
        block_last = np.frombuffer(
            self._meta_tbl["block_last"][row].as_py(),
            dtype=np.uint64).astype(np.int64)
        cell = self._cell("docs", row)
        n = int(self._df[key])
        nblocks = len(block_last)
        block = self.block
        mask = np.zeros(nblocks, dtype=bool)
        mask[idxs] = True
        deltas = decode_u64_blocks(cell["docs"], block, mask)
        tfs = decode_u64_blocks(cell["tfs"], block, mask)
        dls = decode_u64_blocks(cell["dls"], block, mask)

        starts = idxs * block
        ends = np.minimum(starts + block, n)
        lens = ends - starts
        DECODE_STATS["blocks"] += int(lens.sum())
        pos = np.concatenate([np.arange(s, e) for s, e in zip(starts, ends)])
        d = deltas[pos].astype(np.int64)
        # per-block cumsum with restart at the previous block's last id
        cs = np.cumsum(d)
        sb = np.zeros(len(idxs), dtype=np.int64)
        np.cumsum(lens[:-1], out=sb[1:])
        prefix = np.where(sb > 0, cs[np.maximum(sb - 1, 0)], 0)
        base = np.where(idxs > 0, block_last[np.maximum(idxs - 1, 0)], 0)
        ids = cs - np.repeat(prefix - base, lens)
        scores = idf * tf_norm(tfs[pos].astype(np.int64),
                               dls[pos].astype(np.int64), k1, b, avgdl)
        return ids, scores

    def score_term(
        self, term: str, bucket: int, idf: float,
        k1: float, b: float, avgdl: float,
        doc_range: tuple[int, int] | None = None,
    ):
        """-> (doc_ids, scores) for one term slice; block-skips outside
        ``doc_range`` [lo, hi] using block_last metadata (the WAND-style
        skip path used by conjunctions)."""
        key = (term, bucket)
        row = self._rows.get(key)
        if row is None:
            return None
        if doc_range is not None and key not in self._cache:
            meta = self.block_meta(term, bucket)
            block_last = meta[0].astype(np.int64)
            lo, hi = doc_range
            # first block whose last >= lo .. last block whose first <= hi
            b0 = int(np.searchsorted(block_last, lo, side="left"))
            b1 = int(np.searchsorted(block_last, hi, side="left"))
            nblocks = len(block_last)
            if b0 >= nblocks:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            # block-restart decode (same as score_blocks): doc, tf AND
            # dl decode all cost O(selected blocks), not O(df)
            idxs = np.arange(b0, min(nblocks, b1 + 1), dtype=np.int64)
            ids, scores = self._score_selected_blocks(
                key, row, idxs, idf, k1, b, avgdl)
            sel = (ids >= lo) & (ids <= hi)
            return ids[sel], scores[sel]
        else:
            got = self.postings(term, bucket)
            d, t_, l_ = got
            if doc_range is not None:
                lo, hi = doc_range
                sel = (d >= lo) & (d <= hi)
                d, t_, l_ = d[sel], t_[sel], l_[sel]
        return d, idf * tf_norm(t_, l_, k1, b, avgdl)


class SegmentGroupReader:
    """A set of segment readers keyed by segment id (one per query actor
    or one per driver for inline mode)."""

    def __init__(self, paths: dict[int, str], codec_block: int = 128):
        self._paths = paths
        self.block = codec_block
        self._readers: dict[int, SegmentReader] = {}

    def reader(self, seg_id: int) -> SegmentReader | None:
        r = self._readers.get(seg_id)
        if r is None:
            p = self._paths.get(seg_id)
            if p is None:
                return None
            r = self._readers[seg_id] = SegmentReader(p, self.block)
        return r

    def score_term(self, seg_id: int, term: str, bucket: int, idf: float,
                   k1: float, b: float, avgdl: float,
                   doc_range=None):
        r = self.reader(seg_id)
        return None if r is None else r.score_term(
            term, bucket, idf, k1, b, avgdl, doc_range)

    def df(self, seg_id: int, term: str, bucket: int = 0) -> int:
        r = self.reader(seg_id)
        return 0 if r is None else r.df(term, bucket)
