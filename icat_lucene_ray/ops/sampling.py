"""Dataset-curation operators: deterministic stratified sampling and
token-budget packing.

Both are brief-mandated training-data tooling (no reference analog).
Determinism is a hard requirement — a curation run must be exactly
reproducible and SQL-auditable — so sampling uses Knuth
multiplicative hashing on the id (no RNG state), and packing uses a
global prefix sum (two-pass scan), not an order-dependent stateful
fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: Knuth's multiplicative hash constant (2^32 / phi). The sampling
#: decision for id i is ((i * KNUTH) mod 2^32) / 2^32 < fraction —
#: deterministic, uniform for ids with any stride pattern, and exactly
#: reproducible in ANSI SQL ((i * 2654435761) % 4294967296).
KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def _keep_mask(ids: np.ndarray, frac: np.ndarray | float) -> np.ndarray:
    h = (ids.astype(np.uint64) * KNUTH) % _M32
    return h < (np.asarray(frac, dtype=np.float64) * float(_M32))


def stratified_sample(ds, strata_col: str, fractions: dict[str, float],
                      default_frac: float = 0.0, id_col: str = "doc_id"):
    """Keep a deterministic per-stratum fraction of rows.

    Stateless ``map_batches`` filter — no shuffle, no RNG, no driver
    state; re-running on any partitioning keeps the identical rows.
    """
    items = sorted(fractions.items())

    def _filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        fmap = dict(items)
        # vectorize the per-row fraction via the batch's dictionary
        enc = batch[strata_col].combine_chunks().dictionary_encode()
        dict_frac = np.array(
            [fmap.get(s, default_frac) for s in enc.dictionary.to_pylist()],
            dtype=np.float64)
        frac = dict_frac[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(_keep_mask(ids, frac)))

    return ds.map_batches(_filter, batch_format="pyarrow")


def pack_token_budget(ds, tokens_col: str, budget: int,
                      id_col: str = "doc_id", out: str = "chunk_id"):
    """Assign docs (in ``id_col`` order) to training chunks of
    ~``budget`` tokens: chunk_id = floor(exclusive-prefix-sum(tokens)
    / budget) — the same assignment as a sequential packer that starts
    a new chunk when the budget would overflow a monotone counter.

    Distributed as a two-pass global prefix sum: pass 1 sorts by id and
    computes per-block token subtotals (tiny — one row per block);
    the driver folds them into per-block base offsets; pass 2 assigns
    chunk ids per block from base + local cumsum. The driver holds
    O(blocks), never O(rows).
    """
    sorted_ds = ds.select_columns([id_col, tokens_col]).sort(id_col)
    mat = sorted_ds.materialize()

    import ray

    def _block_sum(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "tsum": pa.array([], pa.int64())})
        t = block[tokens_col].to_numpy(zero_copy_only=False)
        ids = block[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"first_id": pa.array([int(ids[0])], pa.int64()),
                         "tsum": pa.array([int(t.sum())], pa.int64())})

    # one tiny row per BLOCK (batch_size=None -> batch == block); blocks
    # of a sorted dataset are range-partitioned, so ordering the
    # subtotals by first_id reconstructs the global scan order
    sums = sorted(
        (r["first_id"], r["tsum"])
        for r in mat.map_batches(_block_sum, batch_format="pyarrow",
                                 batch_size=None).take_all())
    base_by_first_id = {}
    acc = 0
    for fid, s in sums:
        base_by_first_id[int(fid)] = acc
        acc += int(s)
    base_ref = ray.put(base_by_first_id)

    def _assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out, pa.array([], pa.int64()))
        b = ray.get(base_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        t = batch[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = b[int(ids[0])]
        excl = start + np.cumsum(t) - t
        return batch.append_column(out, pa.array(excl // budget, pa.int64()))

    return mat.map_batches(_assign, batch_format="pyarrow",
                           batch_size=None)


def group_topk(ds, key_col: str, score_col: str, k: int, *,
               id_col: str = "doc_id", ascending: bool = False,
               num_buckets: int = 64):
    """Top-k rows per key (e.g. best documents per domain): ties broken
    by ascending ``id_col`` — fully deterministic.

    Two stages, both shuffle-light:
    1. per-BATCH partial top-k per key (vectorized lexsort) — at most
       k rows per (key, batch) enter the shuffle, so shuffle volume is
       bounded by k * keys, not rows;
    2. keys bucket by md5 of the key string (hashed once per UNIQUE
       batch key, broadcast to rows via dictionary indices), one
       vectorized selection per bucket group call.
    """
    import hashlib

    import pyarrow.compute as pc

    def _rank_mask(keys_np: np.ndarray, scores: np.ndarray,
                   ids: np.ndarray) -> np.ndarray:
        s = scores if ascending else -scores
        order = np.lexsort((ids, s, keys_np))
        kk = keys_np[order]
        rank = np.arange(len(kk), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        base = np.zeros(len(kk), dtype=np.int64)
        base[starts] = rank[starts]
        np.maximum.accumulate(base, out=base)
        keep_sorted = (rank - base) < k
        keep = np.zeros(len(kk), dtype=bool)
        keep[order] = keep_sorted
        return keep

    def _partial(batch: pa.Table) -> pa.Table:
        enc = batch[key_col].dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _rank_mask(
            kidx,
            batch[score_col].to_numpy(zero_copy_only=False)
            .astype(np.float64),
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        out = batch.filter(pa.array(keep))
        enc2 = out[key_col].dictionary_encode()
        if isinstance(enc2, pa.ChunkedArray):
            enc2 = enc2.combine_chunks()
        uniq = enc2.dictionary.to_pylist()
        bkt_u = np.fromiter(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
             % num_buckets for u in uniq),
            dtype=np.int64, count=len(uniq))
        bkt = bkt_u[enc2.indices.to_numpy(zero_copy_only=False)] \
            if out.num_rows else np.array([], dtype=np.int64)
        return out.append_column("_tbkt", pa.array(bkt))

    def _final(g: pa.Table) -> pa.Table:
        enc = g[key_col].dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        keep = _rank_mask(
            enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            g[score_col].to_numpy(zero_copy_only=False).astype(np.float64),
            g[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        return g.filter(pa.array(keep)).drop_columns(["_tbkt"])

    return ds.map_batches(_partial, batch_format="pyarrow") \
             .groupby("_tbkt").map_groups(_final, batch_format="pyarrow")
