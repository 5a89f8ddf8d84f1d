"""Document ID assignment.

The reference uses Lucene's per-shard int docIDs plus an application
``id`` field (``Lucene.java:403-411``). For a distributed, resumable
build we need globally-unique, *stateless* IDs (SURVEY.md §7.2 step 4):

- if the input already has a unique int64 id column, use it verbatim;
- otherwise derive a deterministic 63-bit id from the document key
  (``url``) via blake2b. Order-independent and idempotent across
  re-runs of any partition. Collision odds at 10^12 docs ≈ 2.7e-5 per
  pair-bucket (birthday over 2^63) — the build verifies uniqueness at
  stats time and reports duplicates in the manifest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def hash_ids_from_strings(values: pa.Array | list[str]) -> np.ndarray:
    """Deterministic 63-bit ids from string keys (vector of blake2b-8)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF
    return out


def term_shard(term_bytes: bytes, num_segments: int) -> int:
    """Stable term -> segment routing (hash-mod; not Python's salted hash)."""
    h = hashlib.blake2b(term_bytes, digest_size=8).digest()
    return int.from_bytes(h, "big") % num_segments


def term_shards_np(terms: "pa.Array | list[str]", num_segments: int) -> np.ndarray:
    """Vectorized-ish term shard assignment for a batch of terms."""
    if isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = terms.to_pylist()
    out = np.empty(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        out[i] = term_shard(t.encode("utf-8"), num_segments)
    return out
