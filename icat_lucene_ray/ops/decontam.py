"""Benchmark decontamination — flag training docs sharing word
n-grams with an evaluation/benchmark set.

The standard decontamination step in LLM training-data pipelines
(n-gram-overlap decontamination as described in the GPT-3 paper's
appendix and subsequent open data cards): any training document that
contains a word n-gram also present in a held-out benchmark document
is flagged as contaminated (and usually dropped or quarantined).

Shape of the computation, Ray-Data-first:

- The BENCHMARK side is small by construction (eval sets are 10^3-10^5
  short items, vs 10^9+ training docs): its distinct n-gram set is
  reduced per-batch (``map_batches`` emitting per-batch-distinct
  shingles), unioned on the driver, and broadcast ONCE via
  ``ray.put`` — O(benchmark n-grams) per node, never per batch.
- The TRAINING side streams: one stateless ``map_batches`` stage
  computes per-doc distinct shingles (the same vectorized
  gather+``binary_join`` used by exact n-gram dedup) and membership
  against the broadcast set with one hashed ``pc.is_in`` over the
  batch's shingle DICTIONARY (unique strings only), so per-batch cost
  is O(unique shingles), not O(token positions). No shuffle anywhere.

Shingling matches :func:`icat_lucene_ray.ops.dedup._ngram_shingle_strings`
exactly (tokens = ``\\s+`` split, empties dropped; docs with <= n
tokens contribute ONE shingle over all their tokens) so the DuckDB
oracle can reproduce it verbatim with ``string_split_regex`` +
``list_transform``.

The reference engine has no decontamination (its corpus is ICAT
metadata, not training text); this module is brief-mandated
training-data tooling on top of the parity surface (SURVEY.md
"beyond the reference" ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from icat_lucene_ray.ops.dedup import _ngram_shingle_strings


def _batch_distinct_shingles(batch: pa.Table, text_col: str, n: int
                             ) -> pa.Table:
    """Per-batch combiner: the DISTINCT shingle strings of this batch
    (a many-to-one reduction before anything leaves the task)."""
    _, sh = _ngram_shingle_strings(batch[text_col], n)
    return pa.table({"g": pc.unique(sh)})


def benchmark_ngram_set(bench_ds: "ray.data.Dataset", *,
                        text_col: str = "text", n: int = 5) -> pa.Array:
    """Distinct n-gram shingles of the benchmark set, as one Arrow
    string array on the driver.

    Driver materialization is by design: benchmarks are the SMALL side
    (their distinct-shingle set is a per-node broadcast constant). The
    per-batch ``unique`` bounds what each task ships."""
    parts = []
    for b in bench_ds.map_batches(
            _batch_distinct_shingles, batch_format="pyarrow",
            fn_args=(text_col, n)).iter_batches(batch_format="pyarrow"):
        parts.append(b["g"])
    if not parts:
        return pa.array([], pa.string())
    return pc.unique(pa.chunked_array(parts).combine_chunks())


def ngram_contamination(ds: "ray.data.Dataset",
                        bench: "ray.data.Dataset | pa.Array | list[str]",
                        *, n: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_hits: int = 1) -> "ray.data.Dataset":
    """Per-doc benchmark n-gram overlap: columns ``(id_col, n_ngrams,
    n_hits, contaminated)`` where ``n_ngrams`` counts the doc's
    DISTINCT shingles, ``n_hits`` how many of them occur anywhere in
    ``bench``, and ``contaminated = n_hits >= min_hits``.

    ``bench`` may be a (small) Dataset of texts, or a precomputed
    shingle array / list of texts. The broadcast is one ``ray.put``.
    """
    if isinstance(bench, ray.data.Dataset):
        bench_set = benchmark_ngram_set(bench, text_col=text_col, n=n)
    elif isinstance(bench, (pa.Array, pa.ChunkedArray)):
        bench_set = pc.unique(pa.chunked_array([bench]).combine_chunks())
    else:
        _, sh = _ngram_shingle_strings(pa.array(list(bench), pa.string()), n)
        bench_set = pc.unique(sh)
    bench_ref = ray.put(bench_set)

    def _flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        nrows = batch.num_rows
        sh_off, sh = _ngram_shingle_strings(batch[text_col], n)
        enc = sh.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = max(1, len(enc.dictionary))
        doc_rep = np.repeat(np.arange(nrows, dtype=np.int64),
                            np.diff(sh_off))
        # distinct (doc, shingle) pairs in one sort-free pass
        uniq = np.unique(doc_rep * K + codes)
        u_doc, u_code = uniq // K, uniq % K
        n_ngrams = np.bincount(u_doc, minlength=nrows)
        # membership test on the batch's UNIQUE shingles only
        hit_code = pc.is_in(enc.dictionary, value_set=bset) \
            .to_numpy(zero_copy_only=False)
        hit_rows = u_doc[hit_code[u_code]]
        n_hits = np.bincount(hit_rows, minlength=nrows)
        return pa.table({
            id_col: batch[id_col],
            "n_ngrams": pa.array(n_ngrams.astype(np.int64)),
            "n_hits": pa.array(n_hits.astype(np.int64)),
            "contaminated": pa.array(n_hits >= min_hits),
        })

    return ds.map_batches(_flag, batch_format="pyarrow")


def decontaminate(ds: "ray.data.Dataset",
                  bench: "ray.data.Dataset | pa.Array | list[str]",
                  *, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_hits: int = 1) -> "ray.data.Dataset":
    """Drop contaminated docs: ``ds`` minus every row whose distinct
    benchmark-n-gram overlap reaches ``min_hits``. Streaming join-free
    filter — the flag stage already has the verdict per row, so the
    drop happens in the same ``map_batches`` pass (no id shuffle)."""
    if not isinstance(bench, ray.data.Dataset):
        if isinstance(bench, (pa.Array, pa.ChunkedArray)):
            bench_set = pc.unique(pa.chunked_array([bench]).combine_chunks())
        else:
            _, sh = _ngram_shingle_strings(
                pa.array(list(bench), pa.string()), n)
            bench_set = pc.unique(sh)
    else:
        bench_set = benchmark_ngram_set(bench, text_col=text_col, n=n)
    bench_ref = ray.put(bench_set)

    def _keep(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        nrows = batch.num_rows
        sh_off, sh = _ngram_shingle_strings(batch[text_col], n)
        enc = sh.dictionary_encode()
        hit_code = pc.is_in(enc.dictionary, value_set=bset) \
            .to_numpy(zero_copy_only=False)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(np.arange(nrows, dtype=np.int64),
                            np.diff(sh_off))
        # distinct hit count per doc (min_hits may be > 1)
        hit_mask = hit_code[codes]
        K = max(1, len(enc.dictionary))
        uniq = np.unique(doc_rep[hit_mask] * K + codes[hit_mask].astype(np.int64))
        n_hits = np.bincount(uniq // K, minlength=nrows)
        return batch.filter(pa.array(n_hits < min_hits))

    return ds.map_batches(_keep, batch_format="pyarrow")
