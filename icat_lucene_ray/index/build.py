"""Distributed inverted-index build — Ray-Data-first.

Pipeline (SURVEY.md §7.2; north_rule):

  Phase A  tokenize+stats  ``read_parquet(pages)`` → ``map_batches(
                    Tokenizer)`` actor pool (zero-copy Arrow in, per-doc
                    term-frequency vectors out) → ``map_batches(
                    AnalyzedWriter)`` task stage that writes the
                    analyzed/doc-store parquet files itself and returns
                    ONE tiny stats row per file (row count, Σdoc_len,
                    doc-id range, head-term df candidates). The stats
                    rows are the only thing the driver materializes, so
                    global corpus stats cost no second scan — at 10^12
                    docs that saves a multi-TB column-scan job. The
                    analyzed table doubles as the doc store (stored
                    fields + doc_len ≈ Lucene StoredField + norms,
                    ``Field.java:59-60,85-96``). Resumable per input
                    shard via lineage markers that also carry the folded
                    stats (≈ the reference's lock(minId,maxId)
                    population protocol, ``Lucene.java:1155-1212``).
  Phase B  plan     driver-side arithmetic over the stats rows: N,
                    avgdl, doc-id range, and the hot-term salt map
                    (Zipf head detection from the per-file df
                    candidates). No cluster work.
  Phase C  postings explicit map-side-split exchange — the ONLY
                    all-to-all in the build. One ``encode`` task per
                    analyzed row-group range runs the ``RunEncoder``
                    combiner (one sorted posting run per (term[,bucket])
                    per batch) and splits its output into S per-segment
                    pieces (``num_returns=S``); one ``write`` task per
                    segment concatenates its pieces and writes one
                    immutable bit-packed segment with block-max
                    metadata. No sort-based shuffle: the segment writer
                    re-sorts its own postings locally (lexsort), so a
                    hash exchange is sufficient — measured ~2× faster
                    than ``groupby(skey)`` (which must globally sort)
                    and identical output byte-for-byte.

Partitioning assumptions of the exchange (documented per the
custom-operator rule):

- ``S`` (num_segments) must be sized so one segment's posting runs fit
  a worker's heap (runs ≈ 1.4× the analyzed-table bytes; pick
  S ≥ runs_bytes / ~2 GB at scale).
- encode-task count T is bounded (row-group grouping targets a few
  hundred tasks) so the piece matrix T×S stays small; at extreme scale
  add an intermediate combine level.
- Pieces are compacted before return so object-store shipping is
  proportional to the slice, not the parent table.

Head-term skew (SURVEY.md §7.4): terms with global df >
``salt_df_threshold`` are split across ``n_salt`` doc-range buckets,
each routed to a different segment; buckets are contiguous doc-id
ranges so the query side reassembles the posting list by cheap ordered
concatenation, never a re-sort.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.config import DEFAULT_CONFIG, EngineConfig
from icat_lucene_ray.index.codec import encode_postings_multi
from icat_lucene_ray.index.docids import term_shards_np
from icat_lucene_ray.index.manifest import IndexManifest


# ---------------------------------------------------------------------------
# Phase A: tokenize
# ---------------------------------------------------------------------------

def merge_field_tokens(van, batch: pa.Table, text_cols: list[str]) -> dict:
    """M2 field→physical expansion: tokenize each text column, prefix its
    terms with ``"{field}:"`` (per-field posting namespaces in ONE term
    dictionary ≈ Lucene per-field terms, ``Field.java:51-72``), and merge
    the per-doc lists doc-major. Emits a per-posting ``dls`` list (the
    posting's FIELD length — BM25 normalizes per field) plus per-field
    ``dl__{field}`` doc columns for stats/commits.

    Vectorized: prefixing touches only the per-batch term dictionary; the
    doc-major merge is one ``concat_ranges`` gather over the concatenated
    flat arrays."""
    from icat_lucene_ray.index.codec import concat_ranges

    n = batch.num_rows
    per = []
    for col in text_cols:
        offs, terms, tfs, dls = van.term_freq_batch(batch[col])
        enc = terms.dictionary_encode()
        pref = pa.array([f"{col}:{t}" for t in enc.dictionary.to_pylist()],
                        pa.string())
        per.append((offs, pref.take(enc.indices), tfs, dls))

    lens = np.stack([np.diff(p[0]) for p in per], axis=1)       # (n, F)
    bases = np.concatenate([[0], np.cumsum([len(p[1]) for p in per])])
    starts = np.stack([p[0][:-1] + bases[i] for i, p in enumerate(per)],
                      axis=1)                                    # (n, F)
    flat_lens = lens.reshape(-1)
    flat_starts = starts.reshape(-1)
    nz = flat_lens > 0
    total = int(flat_lens.sum())
    gather = concat_ranges(flat_starts[nz], flat_lens[nz],
                           np.empty(total, np.int64))
    comb_terms = pa.concat_arrays(
        [p[1].combine_chunks() if isinstance(p[1], pa.ChunkedArray) else p[1]
         for p in per]).take(pa.array(gather))
    comb_tfs = np.concatenate([np.asarray(p[2]) for p in per])[gather]
    dl_flat = np.concatenate(
        [np.repeat(np.asarray(p[3]), np.diff(p[0])) for p in per])[gather]
    off32 = pa.array(np.concatenate(
        [[0], np.cumsum(lens.sum(axis=1))]), pa.int32())
    cols: dict[str, Any] = {
        "doc_len": pa.array(
            np.sum([np.asarray(p[3], dtype=np.int64) for p in per], axis=0)
            .astype(np.int32) if n else np.zeros(0, np.int32)),
        "terms": pa.ListArray.from_arrays(off32, comb_terms),
        "tfs": pa.ListArray.from_arrays(off32, pa.array(comb_tfs)),
        "dls": pa.ListArray.from_arrays(
            off32, pa.array(dl_flat.astype(np.int32))),
    }
    for col, p in zip(text_cols, per):
        cols[f"dl__{col}"] = pa.array(np.asarray(p[3], dtype=np.int32))
    return cols


def tokenize_with_positions(van, texts) -> dict:
    """Q4 positional tokenize: per-doc terms/tfs plus a ``poss`` list —
    the position of every occurrence, grouped per (doc, term) in the
    terms-list order (what the positional posting codec expects)."""
    offsets, terms, tfs, doc_lens, pos_flat = van.term_freq_batch_pos(texts)
    off32 = pa.array(offsets, type=pa.int32())
    pos_off = np.zeros(len(doc_lens) + 1, dtype=np.int64)
    np.cumsum(doc_lens.astype(np.int64), out=pos_off[1:])
    return {
        "doc_len": pa.array(doc_lens),
        "terms": pa.ListArray.from_arrays(off32, terms),
        "tfs": pa.ListArray.from_arrays(off32, pa.array(tfs)),
        "poss": pa.ListArray.from_arrays(
            pa.array(pos_off, pa.int32()), pa.array(pos_flat)),
    }


class Tokenizer:
    """Actor-pool stage: analyzer + vectorized kernel built once per
    actor; the candidate→stems memo is the per-worker state (≈ the
    reference's per-process analyzer singletons,
    ``IcatSynonymAnalyzer.java:31-44``). Heavy splitting runs in Arrow's
    re2 kernel; Python touches only unique candidates per batch.

    With >1 ``text_cols`` the batch goes through
    :func:`merge_field_tokens` (field-prefixed terms, per-posting field
    doc lengths)."""

    def __init__(self, analyzer: str, text_col: str | None, id_col: str | None,
                 key_col: str, meta_cols: list[str],
                 text_cols: list[str] | None = None,
                 positions: bool = False):
        from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer

        self.van = VectorizedAnalyzer(get_analyzer(analyzer))
        self.text_cols = list(text_cols) if text_cols else [text_col]
        self.id_col = id_col
        self.key_col = key_col
        self.meta_cols = meta_cols
        self.positions = positions
        if positions and len(self.text_cols) > 1:
            raise ValueError("positions=True supports a single text field")

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        if self.id_col is not None:
            cols["doc_id"] = batch[self.id_col].cast(pa.int64())
        # else: DENSE implicit ids — doc_id = file base + row, assigned
        # in phase B from per-file row counts (Lucene-ordinal-style;
        # narrow posting deltas). No id column is materialized.
        if len(self.text_cols) > 1:
            cols.update(merge_field_tokens(self.van, batch, self.text_cols))
        elif self.positions:
            cols.update(tokenize_with_positions(
                self.van, batch[self.text_cols[0]]))
        else:
            offsets, terms, tfs, doc_lens = self.van.term_freq_batch(
                batch[self.text_cols[0]])
            off32 = pa.array(offsets, type=pa.int32())
            cols["doc_len"] = pa.array(doc_lens)
            cols["terms"] = pa.ListArray.from_arrays(off32, terms)
            cols["tfs"] = pa.ListArray.from_arrays(off32, pa.array(tfs))
        for m in self.meta_cols:
            cols[m] = batch[m]
        return pa.table(cols)


class AnalyzedWriter:
    """Task stage: writes one analyzed parquet file per batch (atomic
    write-then-rename; the file name is a content hash of the doc-id
    buffer so a retried task overwrites its own output, never
    duplicates it) and returns a single stats row: row count, Σdoc_len,
    doc-id range, and the batch's head-term df candidates (terms whose
    in-batch df clears ``min_df`` — on Zipfian text the global head is
    the head of every batch, so summing these per-file partials gives
    the driver a reliable salt-map estimate with no term shuffle)."""

    STATS_SCHEMA = pa.schema([
        ("path", pa.string()),
        ("n_docs", pa.int64()),
        ("sum_dl", pa.int64()),
        ("min_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("cand_terms", pa.list_(pa.string())),
        ("cand_dfs", pa.list_(pa.int64())),
        # multi-field (M2): per-field Σdoc_len for per-field avgdl
        ("field_names", pa.list_(pa.string())),
        ("field_sum_dl", pa.list_(pa.int64())),
    ])

    def __init__(self, shard_dir: str, key_col: str | None = None,
                 max_candidates: int = 1024, compression: str = "lz4"):
        self.shard_dir = shard_dir
        self.key_col = key_col
        self.max_candidates = max_candidates
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self.STATS_SCHEMA.empty_table()
        # content-hash filename (idempotent on task retry): keyed on the
        # id column when present, else the document key column
        kc = ("doc_id" if "doc_id" in batch.column_names else self.key_col)
        key = batch[kc].combine_chunks()
        name = hashlib.blake2b(
            b"".join(bytes(b) for b in key.buffers() if b is not None),
            digest_size=8).hexdigest()
        path = os.path.join(self.shard_dir, f"an_{name}.parquet")
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        pq.write_table(batch, tmp, row_group_size=8192,
                       compression=self.compression)
        os.replace(tmp, path)

        # head-term candidates: per-batch df via dictionary codes
        flat = batch["terms"].combine_chunks().flatten()
        cand_t: list[str] = []
        cand_d: list[int] = []
        if len(flat):
            enc = flat.dictionary_encode()
            dfs = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                              minlength=len(enc.dictionary))
            min_df = max(8, batch.num_rows // 50)
            top = np.nonzero(dfs >= min_df)[0]
            if len(top) > self.max_candidates:
                top = top[np.argsort(dfs[top])[::-1][:self.max_candidates]]
            cand_t = pc.take(enc.dictionary, pa.array(top)).to_pylist()
            cand_d = dfs[top].tolist()

        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        if "doc_id" in batch.column_names:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mn, mx = int(ids.min()), int(ids.max())
        else:
            mn = mx = -1  # dense mode: ids assigned in phase B
        f_names = [c[4:] for c in batch.column_names if c.startswith("dl__")]
        f_sums = [int(batch[f"dl__{f}"].to_numpy(zero_copy_only=False)
                      .astype(np.int64).sum()) for f in f_names]
        return pa.table({
            "path": [path],
            "n_docs": [batch.num_rows],
            "sum_dl": [int(dl.sum())],
            "min_doc": [mn],
            "max_doc": [mx],
            "cand_terms": [cand_t],
            "cand_dfs": [cand_d],
            "field_names": [f_names],
            "field_sum_dl": [f_sums],
        }, schema=self.STATS_SCHEMA)


#: per-worker-process AnalyzedWriter cache — the writer stage runs as
#: Ray TASKS (stateless, no actor spawn cost); worker processes are
#: reused, so construction happens once per worker per shard dir
_WRITER_CACHE: dict[str, AnalyzedWriter] = {}


def _write_analyzed_batch(batch: pa.Table, *, shard_dir: str,
                          key_col: str | None = None,
                          compression: str = "lz4") -> pa.Table:
    w = _WRITER_CACHE.get(shard_dir)
    if w is None:
        w = _WRITER_CACHE[shard_dir] = AnalyzedWriter(
            shard_dir, key_col, compression=compression)
    return w(batch)


def _fold_stats(rows: list[dict]) -> dict:
    """Fold AnalyzedWriter stats rows into one shard-level summary."""
    out = {"n_docs": 0, "sum_dl": 0, "min_doc": None, "max_doc": None,
           "cand": {}, "files": [], "field_sum": {}}
    for r in rows:
        if not r["n_docs"]:
            continue
        out["n_docs"] += int(r["n_docs"])
        out["sum_dl"] += int(r["sum_dl"])
        for f, s in zip(r.get("field_names") or [],
                        r.get("field_sum_dl") or []):
            out["field_sum"][f] = out["field_sum"].get(f, 0) + int(s)
        out["files"].append([r["path"], int(r["n_docs"])])
        if int(r["min_doc"]) >= 0:
            mn, mx = int(r["min_doc"]), int(r["max_doc"])
            out["min_doc"] = mn if out["min_doc"] is None else min(out["min_doc"], mn)
            out["max_doc"] = mx if out["max_doc"] is None else max(out["max_doc"], mx)
        cand = out["cand"]
        for t, d in zip(r["cand_terms"], r["cand_dfs"]):
            cand[t] = cand.get(t, 0) + int(d)
    # bound marker size: keep the largest candidates only
    if len(out["cand"]) > 8192:
        keep = sorted(out["cand"].items(), key=lambda kv: -kv[1])[:8192]
        out["cand"] = dict(keep)
    return out


# ---------------------------------------------------------------------------
# Phase C: posting-run combiner + segment writer
# ---------------------------------------------------------------------------

class RunEncoder:
    """Per-batch combiner: emits one sorted posting run per
    (term[, doc-range bucket]) per batch, pre-routed to its shard key.
    This is the classic index-build combiner — it collapses the shuffle
    from one row per posting to one row per distinct term per batch."""

    def __init__(self, num_segments: int, hot_terms: dict[str, int],
                 min_doc: int, max_doc: int):
        self.S = num_segments
        self.hot = hot_terms  # term -> n_salt
        self.min_doc = min_doc
        self.span = max(1, max_doc - min_doc + 1)
        self._shard_memo: dict[str, int] = {}

    def _shards_for(self, dictionary: list[str]) -> np.ndarray:
        memo = self._shard_memo
        out = np.empty(len(dictionary), dtype=np.int32)
        for i, t in enumerate(dictionary):
            s = memo.get(t)
            if s is None:
                s = int(term_shards_np([t], self.S)[0])
                if len(memo) < (1 << 20):
                    memo[t] = s
            out[i] = s
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["terms"].combine_chunks()
        flat_terms = terms.flatten()
        has_pos = "poss" in batch.column_names
        if len(flat_terms) == 0:
            cols = {
                "skey": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int32()),
                "docs": pa.array([], pa.list_(pa.int64())),
                "tf": pa.array([], pa.list_(pa.int32())),
                "dl": pa.array([], pa.list_(pa.int32())),
            }
            if has_pos:
                cols["pos"] = pa.array([], pa.list_(pa.int32()))
            return pa.table(cols)
        lengths = np.diff(terms.offsets.to_numpy(zero_copy_only=False))
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(doc_ids, lengths)
        if "dls" in batch.column_names:
            # multi-field: per-posting field length travels with the term
            dl_rep = batch["dls"].combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False)
            dl_rep = np.repeat(doc_lens, lengths).astype(np.int64)
        tf_flat = batch["tfs"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)

        enc = flat_terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary.to_pylist()
        base_shard = self._shards_for(dictionary)

        # per-posting doc-range bucket for hot terms (0 for cold terms)
        n_salt = np.ones(len(dictionary), dtype=np.int64)
        if self.hot:
            for i, t in enumerate(dictionary):
                s = self.hot.get(t)
                if s:
                    n_salt[i] = s
        buckets = np.zeros(len(codes), dtype=np.int64)
        hot_mask = n_salt[codes] > 1
        if hot_mask.any():
            # bucket = rel // ceil(span/n_salt): overflow-free division
            # (rel can be ~2^63; multiplying first would overflow uint64).
            # Clamped to [0, n_salt): docs outside the planned id range
            # (delta commits add ids the original span never saw) land in
            # the boundary buckets, which stay contiguous doc ranges.
            widths = (self.span + n_salt - 1) // n_salt
            rel = doc_rep[hot_mask] - self.min_doc
            hot_codes = codes[hot_mask]
            buckets[hot_mask] = np.clip(
                rel // widths[hot_codes], 0, n_salt[hot_codes] - 1)

        # NOTE: measured — np.lexsort's per-key integer merge beats a
        # fused-key np.argsort(kind="stable") (timsort on int64) by ~4×
        # here, so the 3-key lexsort stays.
        order = np.lexsort((doc_rep, buckets, codes))
        codes_s, buckets_s = codes[order], buckets[order]
        doc_s, tf_s, dl_s = doc_rep[order], tf_flat[order], dl_rep[order]

        # run boundaries on (code, bucket)
        change = np.empty(len(codes_s), dtype=bool)
        change[0] = True
        np.not_equal(codes_s[1:], codes_s[:-1], out=change[1:])
        if self.hot:
            change[1:] |= buckets_s[1:] != buckets_s[:-1]
        starts = np.flatnonzero(change)
        offsets = np.append(starts, len(codes_s)).astype(np.int32)

        run_codes = codes_s[starts]
        run_buckets = buckets_s[starts].astype(np.int32)
        skey = ((base_shard[run_codes].astype(np.int64) + run_buckets) % self.S).astype(np.int32)
        run_terms = pc.take(enc.dictionary, pa.array(run_codes))

        def _list(vals: np.ndarray, typ) -> pa.ListArray:
            return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                            pa.array(vals.astype(typ)))

        cols = {
            "skey": pa.array(skey),
            "term": run_terms,
            "bucket": pa.array(run_buckets),
            "docs": _list(doc_s, np.int64),
            "tf": _list(tf_s, np.int32),
            "dl": _list(dl_s, np.int32),
        }
        if has_pos:
            # per-posting position slices travel with the run, re-gathered
            # into the lexsorted posting order in one concat_ranges pass
            from icat_lucene_ray.index.codec import concat_ranges

            pos_all = batch["poss"].combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tf64 = tf_flat
            pstart = np.zeros(len(tf64) + 1, dtype=np.int64)
            np.cumsum(tf64, out=pstart[1:])
            total_occ = int(pstart[-1])
            g = concat_ranges(pstart[:-1][order], tf64[order],
                              np.empty(total_occ, np.int64))
            pos_s = pos_all[g]
            run_occ = np.add.reduceat(tf_s, starts) if len(starts) \
                else np.zeros(0, np.int64)
            pos_off = np.zeros(len(starts) + 1, dtype=np.int64)
            np.cumsum(run_occ, out=pos_off[1:])
            cols["pos"] = pa.ListArray.from_arrays(
                pa.array(pos_off, pa.int32()),
                pa.array(pos_s.astype(np.int32)))
        return pa.table(cols)


class SegmentWriter:
    """Merges all runs of one shard key into an immutable segment file
    (≈ ``ShardBucket`` dirs, ``Lucene.java:115-225``, but write-once).
    Rows sorted by (term, bucket) for parquet row-group pruning at
    query time."""

    def __init__(self, out_dir: str, k1: float, b: float, avgdl: float, block: int,
                 name_prefix: str = "seg",
                 field_avgdl: dict[str, float] | None = None,
                 chunk_postings: int = 1_000_000,
                 compression: str = "lz4"):
        self.out_dir = out_dir
        self.k1, self.b, self.avgdl, self.block = k1, b, avgdl, block
        self.name_prefix = name_prefix
        self.compression = compression
        # multi-field: block_max must use the TERM's field avgdl or the
        # BMW bound is not an upper bound (term strings carry the field
        # prefix, so the mapping is resolvable per term row)
        self.field_avgdl = field_avgdl
        # gather/encode in term-group chunks of ~this many postings so
        # the scratch working set stays ~80 B x chunk (cache/TLB
        # resident) instead of ~80 B x segment — the write stage is
        # memory-traffic-bound and first-touch faults on a segment-sized
        # scratch pool (~1 GB/writer at 1.2M docs) dominate its cost on
        # hosts with serialized fault service. Per-term output bytes are
        # identical: groups are independent and chunk order preserves
        # group order.
        self.chunk_postings = max(1, int(chunk_postings))

    def __call__(self, group: pa.Table) -> pa.Table:
        skey = int(group["skey"][0].as_py())
        docs_col = group["docs"].combine_chunks()
        run_off = docs_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(run_off)
        doc_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
        tf_flat = group["tf"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        dl_flat = group["dl"].combine_chunks().flatten().to_numpy(zero_copy_only=False)

        term_enc = group["term"].combine_chunks().dictionary_encode()
        run_codes = term_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        run_buckets = group["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)

        # Sort at RUN granularity (runs are already doc-sorted inside),
        # gather each run's postings into term-grouped layout with ONE
        # pass per stream, then doc-sort only within multi-run term
        # groups (small, cache-resident sorts). This replaces a 3-key
        # lexsort + per-posting key replication — the memory-traffic
        # hot spot under 32-way concurrency.
        from icat_lucene_ray.index.codec import _scratch, concat_ranges

        rkey = run_codes * (run_buckets.max() + 1 if len(run_buckets) else 1) \
            + run_buckets
        run_order = np.argsort(rkey, kind="stable")
        g_lens = lengths[run_order]
        total = int(g_lens.sum())
        g_ends = np.cumsum(g_lens)
        has_pos = "pos" in group.column_names
        if has_pos:
            pos_flat_all = group["pos"].combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tf_orig = tf_flat.astype(np.int64)
            p_start0 = np.zeros(len(tf_orig) + 1, dtype=np.int64)
            np.cumsum(tf_orig, out=p_start0[1:])

        rkey_s = rkey[run_order]
        first_run = np.empty(len(rkey_s), dtype=bool)
        if len(rkey_s):
            first_run[0] = True
            np.not_equal(rkey_s[1:], rkey_s[:-1], out=first_run[1:])
        group_run_idx = np.flatnonzero(first_run)
        n_groups = len(group_run_idx)
        run_pstart = g_ends - g_lens
        starts = run_pstart[group_run_idx]
        ends = np.append(starts[1:], total)
        nruns_per_group = np.diff(np.append(group_run_idx, len(rkey_s)))

        dictionary = term_enc.dictionary
        codes_g = run_codes[run_order][group_run_idx]
        buckets_g = run_buckets[run_order][group_run_idx]
        dict_avg = None
        if self.field_avgdl:
            # per-posting avgdl from the term's field prefix (dictionary
            # is per-batch and small — Python touches uniques only)
            dict_avg = np.array(
                [self.field_avgdl.get(t.split(":", 1)[0], self.avgdl)
                 for t in dictionary.to_pylist()], dtype=np.float64)

        # chunk boundaries at term-GROUP granularity (~chunk_postings
        # postings per chunk; an oversized group stays whole)
        csum = np.cumsum(ends - starts)
        bins = (csum - 1) // self.chunk_postings if n_groups else csum
        cuts = np.concatenate(([0], np.flatnonzero(np.diff(bins)) + 1,
                               [n_groups])) if n_groups else np.array([0, 0])
        acc: dict[str, list] = {k: [] for k in (
            "docs", "tfs", "dls", "block_last", "block_max", "df", "cf")}
        poss_acc: list[bytes] = []
        for ci in range(len(cuts) - 1):
            ga, gb = int(cuts[ci]), int(cuts[ci + 1])
            if gb <= ga:
                continue
            ra = group_run_idx[ga]
            rb = int(group_run_idx[gb]) if gb < n_groups else len(run_order)
            r_sel = run_order[ra:rb]
            r_lens = g_lens[ra:rb]
            base = int(starts[ga])
            total_c = int(ends[gb - 1]) - base
            gather = concat_ranges(run_off[:-1][r_sel], r_lens,
                                   _scratch("gather", total_c, np.int64))
            doc_s = np.take(doc_flat, gather,
                            out=_scratch("doc_s", total_c, doc_flat.dtype))
            tf_s = np.take(tf_flat, gather,
                           out=_scratch("tf_s", total_c, tf_flat.dtype))
            dl_s = np.take(dl_flat, gather,
                           out=_scratch("dl_s", total_c, dl_flat.dtype))
            cs = starts[ga:gb] - base
            ce = ends[ga:gb] - base
            if has_pos:
                # track the posting permutation so per-posting position
                # slices can be re-gathered after the in-group doc sorts
                porder = gather.copy()
            # doc-sort inside term groups that got postings from >1 run
            for gi in np.flatnonzero(nruns_per_group[ga:gb] > 1):
                s, e = cs[gi], ce[gi]
                o = np.argsort(doc_s[s:e], kind="stable")
                doc_s[s:e] = doc_s[s:e][o]
                tf_s[s:e] = tf_s[s:e][o]
                dl_s[s:e] = dl_s[s:e][o]
                if has_pos:
                    porder[s:e] = porder[s:e][o]
            avgdl = self.avgdl if dict_avg is None \
                else np.repeat(dict_avg[codes_g[ga:gb]], ce - cs)
            # one vectorized pass over the chunk's blocks (per-term
            # Python cost is buffer slicing only)
            enc = encode_postings_multi(
                doc_s, tf_s, dl_s, cs, ce,
                k1=self.k1, b=self.b, avgdl=avgdl, block=self.block)
            for k, v in enc.items():
                acc[k].extend(v)
            if has_pos:
                from icat_lucene_ray.index.codec import encode_u64_multi

                tf_final = tf_orig[porder]
                pf_off = np.zeros(len(tf_final) + 1, dtype=np.int64)
                np.cumsum(tf_final, out=pf_off[1:])
                pos_sorted = pos_flat_all[concat_ranges(
                    p_start0[:-1][porder], tf_final,
                    np.empty(int(pf_off[-1]), np.int64))]
                poss_acc.extend(encode_u64_multi(
                    pos_sorted, pf_off[cs], pf_off[ce], self.block))

        seg_cols = {
            "term": dictionary.take(pa.array(codes_g)),
            "bucket": pa.array(buckets_g.astype(np.int32)),
            "df": pa.array(acc["df"], pa.int64()),
            "cf": pa.array(acc["cf"], pa.int64()),
            "docs": pa.array(acc["docs"], pa.binary()),
            "tfs": pa.array(acc["tfs"], pa.binary()),
            "dls": pa.array(acc["dls"], pa.binary()),
            "block_last": pa.array(acc["block_last"], pa.binary()),
            "block_max": pa.array(acc["block_max"], pa.binary()),
        }
        if has_pos:
            seg_cols["poss"] = pa.array(poss_acc, pa.binary())
        seg = pa.table(seg_cols).sort_by(
            [("term", "ascending"), ("bucket", "ascending")])

        path = os.path.join(self.out_dir, "segments",
                            f"{self.name_prefix}_{skey:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(seg, tmp, row_group_size=256,
                       compression=self.compression)
        os.replace(tmp, path)  # atomic, idempotent on retry
        return pa.table({
            "seg_id": pa.array([skey], pa.int32()),
            "n_terms": pa.array([seg.num_rows], pa.int64()),
            "n_postings": pa.array([int(np.sum(lengths))], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })


# ---------------------------------------------------------------------------
# Phase C exchange tasks (explicit hash shuffle, no sort)
# ---------------------------------------------------------------------------

@ray.remote
def _encode_split_task(units: list[tuple[str, int, int, int]],
                       num_segments: int,
                       hot_terms: dict[str, int], min_doc: int, max_doc: int,
                       batch_rows: int,
                       id_bases: dict[str, int] | None = None,
                       has_dls: bool = False,
                       has_pos: bool = False):
    """Read a list of (path, rg_start, rg_end, row_off) analyzed
    row-group ranges, run the RunEncoder combiner, and return S
    per-segment pieces. With ``id_bases`` (dense-id mode) doc ids are
    attached as base(file) + row position. Pieces are compacted
    (combine_chunks) so object-store shipping is proportional to each
    slice."""
    enc = RunEncoder(num_segments=num_segments, hot_terms=hot_terms,
                     min_doc=min_doc, max_doc=max_doc)
    S = num_segments
    parts: list[list[pa.Table]] = [[] for _ in range(S)]
    cols = ["doc_len", "terms", "tfs"] + (["dls"] if has_dls else []) \
        + (["poss"] if has_pos else [])
    if id_bases is None:
        cols = ["doc_id"] + cols
    for path, rg0, rg1, row_off in units:
        pf = pq.ParquetFile(path)
        off = (id_bases[path] + row_off) if id_bases is not None else 0
        for rb in pf.iter_batches(batch_size=batch_rows, columns=cols,
                                  row_groups=list(range(rg0, rg1))):
            t = pa.Table.from_batches([rb])
            if id_bases is not None:
                ids = pa.array(np.arange(off, off + t.num_rows), pa.int64())
                off += t.num_rows
                t = t.add_column(0, "doc_id", ids)
            t = enc(t)
            if t.num_rows == 0:
                continue
            skey = t["skey"].to_numpy(zero_copy_only=False)
            order = np.argsort(skey, kind="stable")
            ts = t.take(pa.array(order))
            bounds = np.searchsorted(skey[order], np.arange(S + 1))
            for s in range(S):
                if bounds[s + 1] > bounds[s]:
                    parts[s].append(
                        ts.slice(bounds[s], bounds[s + 1] - bounds[s]))
    out = []
    for p in parts:
        out.append(pa.concat_tables(p).combine_chunks() if p else None)
    # num_returns=S: with S == 1 Ray treats the return as ONE object, so
    # hand back the bare table rather than a 1-tuple
    return out[0] if S == 1 else tuple(out)


@ray.remote
def _combine_pieces(*pieces):
    """Two-level-exchange intermediate: merge one segment's pieces from
    one group of encode tasks (order-preserving concat, so downstream
    segment bytes are identical to the single-level exchange)."""
    ps = [p for p in pieces if p is not None and p.num_rows]
    if not ps:
        return None
    return pa.concat_tables(ps).combine_chunks()


@ray.remote(max_restarts=2, max_task_retries=2)
class _SegmentWriterActor:
    """Writer-pool actor: each actor writes several segments in sequence.

    Restartable (node loss mid-build must not kill a 100-TB run):
    constructor args are plain values, write() is idempotent — the
    segment file is written to a tmp name and atomically renamed, and
    its bytes are a pure function of the pieces — so a retried write
    after an actor restart produces the identical artifact.

    Actors (not tasks) on purpose, for two measured reasons:
    - the codec scratch-buffer pool warms once per actor and is reused
      for every subsequent segment (fresh task workers re-fault every
      page);
    - the pool bounds concurrent writers. The encode stage is
      compute-bound and scales with CPUs, but segment writing is
      memory-traffic-bound: 32 concurrent writers put this box at >90%
      kernel time (page-fault/TLB storms) and 13× per-task slowdown.
      A bounded pool keeps aggregate throughput at its peak instead.
    """

    def __init__(self, out_dir: str, k1: float, b: float, avgdl: float,
                 block: int, name_prefix: str = "seg",
                 field_avgdl: dict[str, float] | None = None,
                 chunk_postings: int = 1_000_000,
                 compression: str = "lz4"):
        self.w = SegmentWriter(out_dir, k1, b, avgdl, block,
                               name_prefix=name_prefix,
                               field_avgdl=field_avgdl,
                               chunk_postings=chunk_postings,
                               compression=compression)

    def warmup(self, est_postings: int) -> bool:
        """Pre-fault the scratch pool while the encode stage still runs:
        first-touch page faults are this stage's dominant cost, and the
        encode stage is compute-bound, so the two overlap cleanly."""
        from icat_lucene_ray.index.codec import _scratch

        p = min(est_postings, self.w.chunk_postings)
        for name, nbytes in [("gather", 8 * p), ("doc_s", 8 * p),
                             ("tf_s", 4 * p), ("dl_s", 4 * p),
                             ("deltas", 8 * p), ("gpos", 8 * p),
                             ("padded", 9 * p), ("ptfn", 9 * p),
                             ("pay_d", 9 * p), ("pay_t", 2 * p),
                             ("pay_l", 2 * p), ("take64", 8 * p),
                             ("btid", p // 8), ("blocal", p // 8)]:
            _scratch(name, nbytes, np.uint8)[:] = 0
        return True

    def write(self, *pieces):
        t0 = time.monotonic()  # CLOCK_MONOTONIC: driver-comparable
        pieces = [p for p in pieces if p is not None and p.num_rows]
        if not pieces:
            return None
        r = self.w(pa.concat_tables(pieces)).to_pylist()[0]
        r["write_start"] = t0
        r["write_sec"] = round(time.monotonic() - t0, 3)
        return r


def _rowgroup_units(files: list[str], target_tasks: int
                    ) -> list[list[tuple[str, int, int, int]]]:
    """Split analyzed files into ~target_tasks groups of row-group
    ranges (each group = one encode task). Units carry the in-file row
    offset of their first row group so dense doc ids (base + row) can
    be attached without reading anything extra."""
    units: list[tuple[str, int, int, int, int]] = []
    total_rows = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        off = 0
        for rg in range(md.num_row_groups):
            rows = md.row_group(rg).num_rows
            units.append((f, rg, rg + 1, off, rows))
            off += rows
            total_rows += rows
    if not units:
        return []
    per_task = max(1, total_rows // max(1, target_tasks))
    groups: list[list[tuple[str, int, int, int]]] = []
    cur: list[tuple[str, int, int, int]] = []
    cur_rows = 0
    for path, rg0, rg1, off, rows in units:
        # merge contiguous row-groups of the same file into one unit
        if cur and cur[-1][0] == path and cur[-1][2] == rg0:
            cur[-1] = (path, cur[-1][1], rg1, cur[-1][3])
        else:
            cur.append((path, rg0, rg1, off))
        cur_rows += rows
        if cur_rows >= per_task:
            groups.append(cur)
            cur, cur_rows = [], 0
    if cur:
        groups.append(cur)
    return groups


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _lineage(files: list[str], cfg: EngineConfig, extra: str = "") -> str:
    h = hashlib.blake2b(digest_size=12)
    for f in sorted(files):
        try:
            st = os.stat(f)
            h.update(f"{f}:{st.st_size}".encode())
        except OSError:
            h.update(f.encode())
    h.update(json.dumps(cfg.to_dict(), sort_keys=True).encode())
    h.update(extra.encode())
    return h.hexdigest()


def _input_files(path: str | list[str]) -> list[str]:
    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        else:
            out.append(p)
    return sorted(out)


def build_index(
    input_path: str | list[str],
    out_dir: str,
    *,
    text_col: str = "text",
    text_cols: list[str] | None = None,
    id_col: str | None = None,
    key_col: str = "url",
    meta_cols: list[str] | None = None,
    analyzer: str | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    num_segments: int | None = None,
    checkpoint_shards: int = 1,
    resume: bool = False,
    cpu_budget: int | None = None,
) -> IndexManifest:
    """Build an immutable inverted index at ``out_dir``.

    ``id_col``: int64 unique id column; if None, ids are hashed from
    ``key_col``. ``meta_cols`` are carried into the doc store for
    filters / sorting / faceting (≈ stored + doc-values fields).
    ``text_cols``: >1 columns builds a MULTI-FIELD index (M2): posting
    terms are ``"{field}:{stem}"``, BM25 normalizes by per-field avgdl,
    and queries target fields via ``Term(text, field=...)`` / the query
    parser's ``field:term`` syntax (≈ per-entity field lists,
    ``DocumentMapping.java:120-146``).
    ``checkpoint_shards`` splits Phase A into independently-checkpointed
    input shards; ``resume=True`` skips shards whose lineage marker
    matches (≈ the reference's populate lock-range protocol,
    ``Lucene.java:1155-1212``).
    ``cpu_budget`` emulates an N-CPU cluster inside a wider session:
    pool/task counts derive from the budget and every task/actor
    reserves ``cluster_cpus // budget`` CPUs, so at most ~budget CPUs
    run concurrently. Used by the in-session scaling measurement
    (``bench.py --scaling``), where two fresh sessions would otherwise
    land in different host memory-fault regimes and the ratio would
    measure the host, not the engine (BASELINE.md caveat).
    """
    analyzer = analyzer or config.analyzer
    meta_cols = list(meta_cols or [])
    tcols = list(text_cols) if text_cols else [text_col]
    multi = len(tcols) > 1
    for f in tcols:
        if ":" in f:
            raise ValueError(f"text field name {f!r} must not contain ':'")
    if config.positions and multi:
        raise ValueError("positions=True supports a single text field")
    if not id_col and key_col not in meta_cols:
        meta_cols.append(key_col)  # the document key is always a stored field
    S = num_segments or config.num_segments
    files = _input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path!r}")
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    an_dir = os.path.join(out_dir, "analyzed")
    metrics: dict[str, Any] = {}

    # actor-pool size: leave headroom for read/write stages (ray_guide:
    # a pool reserving every CPU starves the other stages; measured, a
    # full-width pool also pays spawn cost that never amortizes on
    # short jobs)
    cluster_ncpu = int(ray.cluster_resources().get("CPU", 4))
    ncpu = min(cpu_budget, cluster_ncpu) if cpu_budget else cluster_ncpu
    #: CPUs each task/actor reserves — 1 normally; cluster/budget under
    #: cpu_budget so stage concurrency shrinks proportionally
    task_cpus = max(1, cluster_ncpu // ncpu) if cpu_budget else 1
    # cap at ncpu-1 so the fixed actor pool can never reserve EVERY
    # CPU: on a 2-CPU cluster (or cpu_budget=2) a full-width pool
    # starves the read/write task operators outright — deadlock, not
    # just contention
    pool = config.tokenize_concurrency or max(
        1, min(ncpu - 1, ncpu * 3 // 4))

    read_cols = tcols + meta_cols
    if id_col:
        read_cols.append(id_col)
    elif key_col not in read_cols:
        read_cols.append(key_col)

    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_min_block = ctx.target_min_block_size
    # analyzed blocks are ~1 MB at default settings -> hundreds of tiny
    # tasks; 32 MB blocks keep per-task overhead amortized
    ctx.target_min_block_size = 32 * 1024 * 1024

    try:
        # ------------- Phase A: tokenize + write + stats ---------------
        t0 = time.perf_counter()
        shards = [files[i::checkpoint_shards] for i in range(checkpoint_shards)]
        shards = [s for s in shards if s]
        skipped = 0
        shard_stats: list[dict] = []
        for si, shard_files in enumerate(shards):
            shard_dir = os.path.join(an_dir, f"shard_{si:05d}")
            marker = os.path.join(shard_dir, "_DONE.json")
            lin = _lineage(shard_files, config, f"A:{analyzer}:{si}")
            if resume and os.path.exists(marker):
                with open(marker) as f:
                    mk = json.load(f)
                if mk.get("lineage") == lin and "stats" in mk:
                    skipped += 1
                    shard_stats.append(mk["stats"])
                    continue
            # stale or partial output: wipe before rewriting (the marker is
            # written last, so a shard dir without a matching marker is junk)
            if os.path.exists(shard_dir):
                import shutil

                shutil.rmtree(shard_dir)
            os.makedirs(shard_dir, exist_ok=True)
            ds = ray.data.read_parquet(
                shard_files, columns=read_cols,
                ray_remote_args={"num_cpus": task_cpus})
            ds = ds.map_batches(
                Tokenizer,
                fn_constructor_kwargs=dict(
                    analyzer=analyzer, text_col=None, id_col=id_col,
                    key_col=key_col, meta_cols=meta_cols, text_cols=tcols,
                    positions=config.positions,
                ),
                batch_format="pyarrow",
                batch_size=config.tokenize_batch_size,
                concurrency=pool,
                num_cpus=task_cpus,
            )
            stats_rows = ds.map_batches(
                _write_analyzed_batch,
                fn_kwargs=dict(shard_dir=shard_dir,
                               key_col=(None if id_col else key_col),
                               compression=config.analyzed_compression),
                batch_format="pyarrow",
                batch_size=config.analyzed_rows_per_file,
                num_cpus=task_cpus,
            ).take_all()
            st = _fold_stats(stats_rows)
            shard_stats.append(st)
            with open(marker, "w") as f:
                json.dump({"lineage": lin, "files": shard_files, "stats": st}, f)
        metrics["phase_a_sec"] = round(time.perf_counter() - t0, 3)
        metrics["phase_a_shards_skipped"] = skipped

        # ------------- Phase B: fold stats, pick salt map (driver) -----
        t0 = time.perf_counter()
        num_docs = sum(s["n_docs"] for s in shard_stats)
        total_len = sum(s["sum_dl"] for s in shard_stats)
        avgdl = (total_len / num_docs) if num_docs else 1.0
        # per-field stats (M2): avgdl_f = Σ field tokens / N over ALL
        # docs (documented divergence from Lucene's per-field docCount —
        # identical whenever every doc carries every field)
        field_stats: dict[str, dict] = {}
        if multi:
            fsum: dict[str, int] = {}
            for s in shard_stats:
                for f, v in s.get("field_sum", {}).items():
                    fsum[f] = fsum.get(f, 0) + int(v)
            field_stats = {
                f: {"total_tokens": v,
                    "avgdl": (v / num_docs) if num_docs else 1.0}
                for f, v in sorted(fsum.items())}
        field_avgdl = {f: st["avgdl"] for f, st in field_stats.items()}
        id_files: list[list] = []
        id_bases: dict[str, int] = {}
        if id_col:
            mins = [s["min_doc"] for s in shard_stats if s["min_doc"] is not None]
            maxs = [s["max_doc"] for s in shard_stats if s["max_doc"] is not None]
            min_doc = min(mins) if mins else 0
            max_doc = max(maxs) if maxs else 0
        else:
            # DENSE implicit ids: doc_id = base(file) + row, bases by
            # prefix sum over the path-sorted analyzed file list. Fully
            # deterministic per (input, config) — file names are content
            # hashes — so resumed/re-run partitions assign identical ids.
            all_files = sorted(
                (p, n) for s in shard_stats for p, n in s.get("files", []))
            if sum(n for _p, n in all_files) != num_docs:
                raise RuntimeError(
                    "dense-id base assignment inconsistent with shard "
                    "stats (stale resume marker from an older layout?) — "
                    "rebuild without --resume")
            base = 0
            for p, n in all_files:
                id_files.append([os.path.relpath(p, out_dir), n])
                id_bases[p] = base
                base += n
            min_doc, max_doc = 0, max(0, num_docs - 1)

        cand: dict[str, int] = {}
        for s in shard_stats:
            for t, d in s["cand"].items():
                cand[t] = cand.get(t, 0) + int(d)
        thresh = min(config.salt_df_threshold, config.target_slice_postings)
        hot_salt: dict[str, int] = {}
        for t, est in cand.items():
            # est is a (slight) underestimate of global df — candidates
            # below a per-file cutoff are dropped — hence the 0.5 margin:
            # over-marking hot is benign (extra slices), under-marking
            # leaves one oversized reduce group
            if est > thresh * 0.5:
                n_salt = min(S, max(1, -(-int(est) // config.target_slice_postings)))
                if n_salt > 1:
                    hot_salt[t] = n_salt
        metrics["phase_b_sec"] = round(time.perf_counter() - t0, 3)

        # ------------- Phase C: explicit exchange -> segments ----------
        t0 = time.perf_counter()
        an_files = [f for f in _input_files(an_dir)
                    if os.path.basename(f).startswith("an_")]
        groups = _rowgroup_units(an_files, target_tasks=ncpu * 3)
        metrics["phase_c_encode_tasks"] = len(groups)
        opts = {"num_returns": S} if S > 1 else {}
        if task_cpus > 1:
            opts["num_cpus"] = task_cpus
        enc_refs = [
            _encode_split_task.options(**opts).remote(
                g, S, hot_salt, min_doc, max_doc,
                config.encode_batch_rows or config.tokenize_batch_size,
                id_bases if not id_col else None, multi, config.positions)
            for g in groups
        ]
        if S == 1:
            enc_refs = [[r] for r in enc_refs]
        # two-level exchange: bound the per-writer piece fan-in (at
        # extreme T, writers would otherwise hold T object refs each)
        fanin = max(2, config.exchange_fanin)
        if len(enc_refs) > fanin:
            combined: list[list] = []
            for s in range(S):
                col = [r[s] for r in enc_refs]
                combined.append([
                    _combine_pieces.options(num_cpus=task_cpus)
                    .remote(*col[i:i + fanin])
                    for i in range(0, len(col), fanin)
                ])
            piece_refs = [list(row) for row in zip(*combined)] \
                if combined else []
            metrics["phase_c_combine_tasks"] = sum(
                len(c) for c in combined)
        else:
            piece_refs = enc_refs
        # writer actors are placed while encode tasks still run; cap
        # them at ncpu-1 so idle writers can never absorb every CPU and
        # starve the encode stage they wait on (deadlock at tiny ncpu)
        n_writers = config.num_writers or min(
            S, max(1, min(ncpu - 1, max(2, ncpu // 4))))
        writers = [
            _SegmentWriterActor.options(num_cpus=task_cpus).remote(
                out_dir, config.k1, config.b, avgdl, config.codec_block,
                field_avgdl=field_avgdl or None,
                chunk_postings=config.writer_chunk_postings,
                compression=config.segment_compression)
            for _ in range(n_writers)
        ]
        if config.writer_warmup:
            # Pre-fault each writer's codec scratch pool WHILE the
            # encode stage runs (sum_dl bounds postings; 1.15 covers
            # segment skew). Fire-and-forget — actor method order
            # guarantees warmup completes before the first write.
            # Measured on this VM: cuts write-busy 736->301 CPU-s but
            # the host's SERIALIZED fault service makes the warmups
            # contend with encode-stage plasma faults and delay the
            # first write (16s->76s), a net loss — hence default-off
            # here, worthwhile where fault service scales with cores.
            est = int(total_len / max(1, S) * 1.15) + 1024
            for w in writers:
                w.warmup.remote(est)
        write_refs = [
            writers[s % n_writers].write.remote(*[r[s] for r in piece_refs])
            for s in range(S)
        ]
        # Release the driver's handles on the piece matrix NOW: each
        # piece stays referenced by exactly the one pending write (or
        # combine) task that consumes it, so plasma frees it the moment
        # that task completes. Without this, the driver pins the full
        # T×S matrix until the LAST segment is written — at scale that
        # is the entire encoded index resident in the object store at
        # once instead of just the writers' in-flight backlog.
        enc_refs = piece_refs = combined = col = None  # noqa: F841
        t0_mono = time.monotonic() - (time.perf_counter() - t0)
        seg_stats = [r for r in ray.get(write_refs) if r is not None]
        for w in writers:
            ray.kill(w)
        metrics["phase_c_sec"] = round(time.perf_counter() - t0, 3)
        # encode-barrier vs write split: writes for segment s wait on
        # EVERY encode task (all-to-all exchange), so first-write-at ≈
        # the encode+combine barrier; write_busy = Σ writer seconds
        # (÷ n_writers for the write wall-clock floor)
        if seg_stats and "write_start" in seg_stats[0]:
            metrics["phase_c_first_write_at"] = round(
                min(r["write_start"] for r in seg_stats) - t0_mono, 3)
            metrics["phase_c_write_busy_sec"] = round(
                sum(r.pop("write_sec") for r in seg_stats), 3)
            metrics["phase_c_writers"] = n_writers
            for r in seg_stats:
                r.pop("write_start", None)
    finally:
        ctx.target_min_block_size = prev_min_block

    # exact global df for hot terms: sum their (term, bucket) slices from
    # the segment term dictionaries (the few hot rows only)
    hot_terms: dict[str, dict] = {}
    if hot_salt:
        import pyarrow.dataset as pads

        seg_ds = pads.dataset(os.path.join(out_dir, "segments"))
        ht = seg_ds.to_table(
            columns=["term", "df"],
            filter=pads.field("term").isin(list(hot_salt)),
        )
        sums: dict[str, int] = {}
        for t, d in zip(ht["term"].to_pylist(), ht["df"].to_pylist()):
            sums[t] = sums.get(t, 0) + int(d)
        hot_terms = {
            t: {"df": sums.get(t, 0), "n_salt": n}
            for t, n in hot_salt.items() if sums.get(t, 0) > 0
        }
    metrics["docs_per_sec_total"] = round(
        num_docs / max(1e-9, metrics["phase_a_sec"] + metrics["phase_b_sec"]
                       + metrics["phase_c_sec"]), 1)

    an = get_analyzer(analyzer)
    manifest = IndexManifest(
        root=out_dir,
        analyzer=analyzer,
        analyzer_version=an.version,
        config=config.to_dict(),
        num_docs=num_docs,
        avgdl=avgdl,
        total_tokens=total_len,
        min_doc=min_doc,
        max_doc=max_doc,
        num_segments=S,
        hot_terms=hot_terms,
        segments=sorted(
            ({k: int(r[k]) for k in ("seg_id", "n_terms", "n_postings", "bytes")}
             for r in seg_stats),
            key=lambda r: r["seg_id"],
        ),
        meta_cols=meta_cols,
        text_fields=tcols,
        field_stats=field_stats,
        termstats="segments",  # term dictionary lives in the segment files
        id_col="doc_id",
        id_assignment="explicit" if id_col else "dense",
        id_files=id_files,
        lineage={"input": _lineage(files, config, analyzer), "files": len(files)},
        metrics=metrics,
    )
    manifest.save()
    if meta_cols:
        # facet sidecar (ST2): doc-id-ordered dictionary codes so facet
        # queries bincount candidates instead of scanning the doc store
        from icat_lucene_ray.index.facets import write_sidecar

        t0 = time.perf_counter()
        write_sidecar(out_dir)
        manifest.metrics["facet_sidecar_sec"] = round(
            time.perf_counter() - t0, 3)
        manifest.save()
    return manifest
