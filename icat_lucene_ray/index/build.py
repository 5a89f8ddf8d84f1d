"""Distributed inverted-index build — Ray-Data-first.

Pipeline (SURVEY.md §7.2; north_rule):

  Phase A  tokenize   ``read_parquet(pages)`` → ``map_batches(Tokenizer)``
                      (zero-copy Arrow in, per-doc term-frequency vectors
                      out) → ``write_parquet(analyzed/)``. The analyzed
                      table doubles as the doc store (stored fields +
                      doc_len ≈ Lucene StoredField + norms,
                      ``Field.java:59-60,85-96``). Resumable per input
                      shard via lineage markers (≈ the reference's
                      lock(minId,maxId) population protocol,
                      ``Lucene.java:1155-1212``).
  Phase B  stats      one cheap numeric aggregate (N, Σdl, doc-id range)
                      + a deterministic sample scan that estimates df for
                      the Zipf head → hot-term set for salting. No term
                      shuffle here: exact per-term df falls out of the
                      Phase C shuffle for free (each (term, bucket) slice
                      lands in exactly one segment), so the segment
                      writers emit the term dictionary (termstats shards)
                      as a side output and the driver sums the few hot
                      slices for exact global hot-term df.
  Phase C  postings   ``map_batches(RunEncoder)`` combiner emits one
                      sorted posting *run* per (term[, doc-range bucket])
                      per batch → the ONLY shuffle in the build,
                      ``groupby(shard_key)`` → ``map_groups`` merges runs
                      and writes one immutable bit-packed segment per
                      shard key with block-max metadata + its termstats
                      shard.

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
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.config import DEFAULT_CONFIG, EngineConfig
from icat_lucene_ray.index.codec import encode_postings_multi
from icat_lucene_ray.index.docids import hash_ids_from_strings, term_shards_np
from icat_lucene_ray.index.manifest import IndexManifest


# ---------------------------------------------------------------------------
# Phase A: tokenize
# ---------------------------------------------------------------------------

class Tokenizer:
    """Actor-pool stage: analyzer + vectorized kernel built once per
    actor; the candidate→stems memo is the per-worker state (≈ the
    reference's per-process analyzer singletons,
    ``IcatSynonymAnalyzer.java:31-44``). Heavy splitting runs in Arrow's
    re2 kernel; Python touches only unique candidates per batch."""

    def __init__(self, analyzer: str, text_col: str, id_col: str | None,
                 key_col: str, meta_cols: list[str]):
        from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer

        self.van = VectorizedAnalyzer(get_analyzer(analyzer))
        self.text_col = text_col
        self.id_col = id_col
        self.key_col = key_col
        self.meta_cols = meta_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, terms, tfs, doc_lens = self.van.term_freq_batch(
            batch[self.text_col])

        if self.id_col is not None:
            doc_ids = batch[self.id_col].cast(pa.int64())
        else:
            doc_ids = pa.array(hash_ids_from_strings(batch[self.key_col]))

        off32 = pa.array(offsets, type=pa.int32())
        cols: dict[str, Any] = {
            "doc_id": doc_ids,
            "doc_len": pa.array(doc_lens),
            "terms": pa.ListArray.from_arrays(off32, terms),
            "tfs": pa.ListArray.from_arrays(off32, pa.array(tfs)),
        }
        for m in self.meta_cols:
            cols[m] = batch[m]
        return pa.table(cols)


# ---------------------------------------------------------------------------
# Phase B: hot-term estimation from a deterministic sample
# ---------------------------------------------------------------------------

def _sample_term_dfs(an_dir: str, max_rows: int = 65536) -> tuple[dict[str, int], int]:
    """Exact df over a deterministic sample (the first analyzed file(s)).

    Used only to *detect* the Zipf head for salting — over-marking a
    term hot costs a few extra slices; under-marking costs one larger
    reduce group — both benign, so a sample is the right tool. Exact
    global df for scoring comes out of Phase C.
    """
    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(an_dir) for f in fs if f.endswith(".parquet")
    )
    counts: dict[str, int] = {}
    rows = 0
    for path in files:
        t = pq.read_table(path, columns=["terms"])
        flat = t["terms"].combine_chunks().flatten()
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(codes, minlength=len(enc.dictionary))
        for term, d in zip(enc.dictionary.to_pylist(), df):
            counts[term] = counts.get(term, 0) + int(d)
        rows += t.num_rows
        if rows >= max_rows:
            break
    return counts, rows


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
        if len(flat_terms) == 0:
            return pa.table({
                "skey": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int32()),
                "docs": pa.array([], pa.list_(pa.int64())),
                "tf": pa.array([], pa.list_(pa.int32())),
                "dl": pa.array([], pa.list_(pa.int32())),
            })
        lengths = np.diff(terms.offsets.to_numpy(zero_copy_only=False))
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(doc_ids, lengths)
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
            # (rel can be ~2^63; multiplying first would overflow uint64)
            widths = (self.span + n_salt - 1) // n_salt
            rel = doc_rep[hot_mask] - self.min_doc
            buckets[hot_mask] = rel // widths[codes[hot_mask]]

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

        return pa.table({
            "skey": pa.array(skey),
            "term": run_terms,
            "bucket": pa.array(run_buckets),
            "docs": _list(doc_s, np.int64),
            "tf": _list(tf_s, np.int32),
            "dl": _list(dl_s, np.int32),
        })


class SegmentWriter:
    """``map_groups`` stage: merge all runs of one shard key into an
    immutable segment file (≈ ``ShardBucket`` dirs, ``Lucene.java:115-225``,
    but write-once). Rows sorted by (term, bucket) for parquet row-group
    pruning at query time."""

    def __init__(self, out_dir: str, k1: float, b: float, avgdl: float, block: int):
        self.out_dir = out_dir
        self.k1, self.b, self.avgdl, self.block = k1, b, avgdl, block

    def __call__(self, group: pa.Table) -> pa.Table:
        skey = int(group["skey"][0].as_py())
        docs_col = group["docs"].combine_chunks()
        lengths = np.diff(docs_col.offsets.to_numpy(zero_copy_only=False))
        doc_flat = docs_col.flatten().to_numpy(zero_copy_only=False)
        tf_flat = group["tf"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        dl_flat = group["dl"].combine_chunks().flatten().to_numpy(zero_copy_only=False)

        term_enc = group["term"].combine_chunks().dictionary_encode()
        run_codes = term_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        run_buckets = group["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes_rep = np.repeat(run_codes, lengths)
        buckets_rep = np.repeat(run_buckets, lengths)

        order = np.lexsort((doc_flat, buckets_rep, codes_rep))
        codes_s, buckets_s = codes_rep[order], buckets_rep[order]
        doc_s, tf_s, dl_s = doc_flat[order], tf_flat[order], dl_flat[order]

        change = np.empty(len(codes_s), dtype=bool)
        change[0] = True
        np.not_equal(codes_s[1:], codes_s[:-1], out=change[1:])
        change[1:] |= buckets_s[1:] != buckets_s[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(codes_s))

        # one vectorized pass over all terms' blocks (per-term Python cost
        # is buffer slicing only)
        enc = encode_postings_multi(
            doc_s, tf_s, dl_s, starts, ends,
            k1=self.k1, b=self.b, avgdl=self.avgdl, block=self.block)
        dictionary = term_enc.dictionary
        seg = pa.table({
            "term": dictionary.take(pa.array(codes_s[starts])),
            "bucket": pa.array(buckets_s[starts].astype(np.int32)),
            "df": pa.array(enc["df"], pa.int64()),
            "cf": pa.array(enc["cf"], pa.int64()),
            "docs": pa.array(enc["docs"], pa.binary()),
            "tfs": pa.array(enc["tfs"], pa.binary()),
            "dls": pa.array(enc["dls"], pa.binary()),
            "block_last": pa.array(enc["block_last"], pa.binary()),
            "block_max": pa.array(enc["block_max"], pa.binary()),
        }).sort_by([("term", "ascending"), ("bucket", "ascending")])

        path = os.path.join(self.out_dir, "segments", f"seg_{skey:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(seg, tmp, row_group_size=2048, compression="zstd")
        os.replace(tmp, path)  # atomic, idempotent on retry
        return pa.table({
            "seg_id": pa.array([skey], pa.int32()),
            "n_terms": pa.array([seg.num_rows], pa.int64()),
            "n_postings": pa.array([int(np.sum(lengths))], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })


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
    id_col: str | None = None,
    key_col: str = "url",
    meta_cols: list[str] | None = None,
    analyzer: str | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    num_segments: int | None = None,
    checkpoint_shards: int = 1,
    resume: bool = False,
) -> IndexManifest:
    """Build an immutable inverted index at ``out_dir``.

    ``id_col``: int64 unique id column; if None, ids are hashed from
    ``key_col``. ``meta_cols`` are carried into the doc store for
    filters / sorting / faceting (≈ stored + doc-values fields).
    ``checkpoint_shards`` splits Phase A into independently-checkpointed
    input shards; ``resume=True`` skips shards whose lineage marker
    matches (≈ the reference's populate lock-range protocol,
    ``Lucene.java:1155-1212``).
    """
    analyzer = analyzer or config.analyzer
    meta_cols = list(meta_cols or [])
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
    # a pool reserving every CPU starves the other stages)
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = config.tokenize_concurrency or max(1, ncpu - 2)

    read_cols = [text_col] + meta_cols
    if id_col:
        read_cols.append(id_col)
    elif key_col not in read_cols:
        read_cols.append(key_col)

    # ---------------- Phase A: tokenize -> analyzed/ -------------------
    t0 = time.perf_counter()
    shards = [files[i::checkpoint_shards] for i in range(checkpoint_shards)]
    shards = [s for s in shards if s]
    skipped = 0
    for si, shard_files in enumerate(shards):
        shard_dir = os.path.join(an_dir, f"shard_{si:05d}")
        marker = os.path.join(shard_dir, "_DONE.json")
        lin = _lineage(shard_files, config, f"A:{analyzer}:{si}")
        if resume and os.path.exists(marker):
            with open(marker) as f:
                if json.load(f).get("lineage") == lin:
                    skipped += 1
                    continue
        # stale or partial output: wipe before rewriting (the marker is
        # written last, so a shard dir without a matching marker is junk)
        if os.path.exists(shard_dir):
            import shutil

            shutil.rmtree(shard_dir)
        ds = ray.data.read_parquet(shard_files, columns=read_cols)
        ds = ds.map_batches(
            Tokenizer,
            fn_constructor_kwargs=dict(
                analyzer=analyzer, text_col=text_col, id_col=id_col,
                key_col=key_col, meta_cols=meta_cols,
            ),
            batch_format="pyarrow",
            batch_size=config.tokenize_batch_size,
            concurrency=pool,
        )
        ds.write_parquet(shard_dir, min_rows_per_file=config.analyzed_rows_per_file)
        with open(marker, "w") as f:
            json.dump({"lineage": lin, "files": shard_files}, f)
    metrics["phase_a_sec"] = round(time.perf_counter() - t0, 3)
    metrics["phase_a_shards_skipped"] = skipped

    # ---------------- Phase B: global stats + hot-term sample ----------
    t0 = time.perf_counter()
    an_stats = ray.data.read_parquet(an_dir, columns=["doc_id", "doc_len"])
    agg = an_stats.aggregate(Sum("doc_len", alias_name="total_len"),
                             Min("doc_id", alias_name="min_doc"),
                             Max("doc_id", alias_name="max_doc"))
    num_docs = an_stats.count()
    total_len = int(agg["total_len"] or 0)
    min_doc = int(agg["min_doc"] or 0)
    max_doc = int(agg["max_doc"] or 0)
    avgdl = (total_len / num_docs) if num_docs else 1.0

    sample_dfs, sample_rows = _sample_term_dfs(an_dir)
    scale = num_docs / max(1, sample_rows)
    thresh = min(config.salt_df_threshold, config.target_slice_postings)
    hot_salt: dict[str, int] = {}
    for t, d in sample_dfs.items():
        est = d * scale
        # 0.5 safety margin: over-marking hot is benign (extra slices),
        # under-marking leaves one oversized reduce group
        if est > thresh * 0.5:
            n_salt = min(S, max(1, -(-int(est) // config.target_slice_postings)))
            if n_salt > 1:
                hot_salt[t] = n_salt
    metrics["phase_b_sec"] = round(time.perf_counter() - t0, 3)

    # ---------------- Phase C: postings shuffle + segments -------------
    t0 = time.perf_counter()
    an_post = ray.data.read_parquet(
        an_dir, columns=["doc_id", "doc_len", "terms", "tfs"])
    runs = an_post.map_batches(
        RunEncoder,
        fn_constructor_kwargs=dict(
            num_segments=S,
            hot_terms=hot_salt,
            min_doc=min_doc, max_doc=max_doc,
        ),
        batch_format="pyarrow",
        batch_size=config.tokenize_batch_size,
        concurrency=pool,
    )
    writer = SegmentWriter(out_dir, config.k1, config.b, avgdl, config.codec_block)

    def write_segment(group: pa.Table) -> pa.Table:
        return writer(group)

    seg_stats = (
        runs.groupby("skey")
        .map_groups(write_segment, batch_format="pyarrow")
        .take_all()
    )
    metrics["phase_c_sec"] = round(time.perf_counter() - t0, 3)

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
        termstats="segments",  # term dictionary lives in the segment files
        id_col="doc_id",
        lineage={"input": _lineage(files, config, analyzer), "files": len(files)},
        metrics=metrics,
    )
    manifest.save()
    return manifest
