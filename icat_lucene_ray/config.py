"""Engine configuration.

Mirrors the knobs the reference exposes in ``run.properties``
(``run.properties:4-17``, parsed at ``Lucene.java:1050-1089``) plus the
knobs a distributed build needs (shard count, salting threshold, codec
block size).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class EngineConfig:
    # ---- BM25 (Lucene 8 defaults; SURVEY.md §7.0) ----
    k1: float = 1.2
    b: float = 0.75

    # ---- analysis ----
    analyzer: str = "icat"  # "icat" | "icat_synonym" | "simple"

    # ---- index layout ----
    #: index token positions (Q4): enables true positional Phrase
    #: queries at ~+30-50% postings size (Lucene TextField indexes
    #: positions by default; our default profile is phrase-lite per
    #: north_rule, positions opt-in behind this flag)
    positions: bool = False
    num_segments: int = 8          # S: term-shard count (#segment files)
    codec_block: int = 128         # postings per bit-packed block (block-max granularity)
    #: parquet compression for SEGMENT files. The payload is already
    #: bit-packed (high entropy): measured zstd = -30% bytes but 2.3x
    #: slower cold row-group reads; lz4 reads at memcpy-speed and still
    #: beats uncompressed on size — Lucene's BEST_SPEED (LZ4) analog.
    #: Cold-read latency IS the query p99, so speed wins by default.
    segment_compression: str = "lz4"
    #: parquet compression for the ANALYZED/doc-store files (written in
    #: phase A, re-read by phase C's encode tasks and by doc fetches).
    #: Same measured tradeoff as segments: lz4 cut phase A 20->17 s and
    #: phase C 25->23 s at 1.2M docs vs zstd, for ~1.6x the temp bytes.
    analyzed_compression: str = "lz4"
    # terms with global df above this get doc-range-salted across
    # multiple segments (head-term skew; SURVEY.md §7.4). The default is
    # sized for tests; the builder also derives a bound from target
    # postings-per-slice.
    salt_df_threshold: int = 250_000
    target_slice_postings: int = 250_000   # max postings per hot-term slice

    # ---- build ----
    #: phase-C exchange fan-in: a segment writer consumes at most this
    #: many piece objects; with more encode tasks an intermediate
    #: combine level merges pieces first (two-level exchange — keeps the
    #: per-writer ref count and the T×S piece matrix bounded at 10^12
    #: docs). Order-preserving, so segment bytes are identical. Sized so
    #: single-node builds (~3×CPUs encode tasks) stay single-level —
    #: the combine hop only pays for itself when T ≫ fanin.
    exchange_fanin: int = 256
    #: segment-writer pool size (phase C). None -> auto (ncpu // 4,
    #: floor 2, cap S). Writing is memory-traffic-bound, not CPU-bound:
    #: past ~ncpu/2 concurrent writers this box spends >90% kernel time
    #: in page-fault service and aggregate throughput drops.
    num_writers: int | None = None
    #: pre-fault writer scratch pools during the encode stage. Free
    #: overlap on hosts whose page-fault service scales with cores; on
    #: hosts with a serialized fault path it contends with encode-stage
    #: plasma faults and delays the first write (measured net loss).
    writer_warmup: bool = False
    #: segment writers gather+encode in term-group chunks of ~this many
    #: postings: bounds the writer's scratch working set to ~80 B x
    #: chunk (cache/TLB resident, faulted once) instead of ~80 B x
    #: segment. Output bytes are identical at any value.
    writer_chunk_postings: int = 1_000_000
    tokenize_batch_size: int = 1024
    #: rows per RunEncoder batch in phase-C encode tasks (None ->
    #: tokenize_batch_size). Larger batches amortize the per-batch
    #: 3-key lexsort and cut the number of sorted runs each segment
    #: writer must k-way merge (sf0.1 sweep: aggregate writer busy
    #: time 149-201 s at 2048 rows, 34-42 s at 8192, rising again at
    #: 32768 as the per-task working set spills cache). Bounded by
    #: per-task heap: rows x avg tokens x ~20 B must fit a worker.
    encode_batch_rows: int | None = 8192
    tokenize_concurrency: int | None = None  # None -> let Ray size the task pool
    analyzed_rows_per_file: int = 65536

    # ---- query (reference: run.properties:10, Lucene.java:1471-1514) ----
    max_search_time_s: float = 5.0
    max_wildcard_terms: int = 1024  # cap on dictionary expansion for wildcards
    #: cache the sorted term dictionary in memory (per Index/actor)
    #: when it has at most this many terms; fuzzy expansion then runs a
    #: pruned column-DP over the cached codes (Lucene automaton∩FST
    #: analog) and wildcard/regexp match in memory instead of
    #: re-scanning parquet per query. Above the cap the streaming
    #: dictionary scan remains (web-scale vocabularies: ~60 B/term
    #: cached, so 4M terms ≈ 250 MB/node — raise deliberately).
    term_dict_cache_max: int = 4_000_000

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "EngineConfig":
        # tolerate manifests written by older builds (missing keys take
        # the current defaults) and by newer ones (unknown keys dropped)
        known = {f for f in EngineConfig.__dataclass_fields__}
        return EngineConfig(**{k: v for k, v in d.items() if k in known})


DEFAULT_CONFIG = EngineConfig()
