"""Distributed EXACT order statistics — iterative histogram narrowing.

``distributed_quantile`` computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: 0-based index ``max(0, ceil(q*n)-1)`` of
the sorted column) without ever sorting or shuffling the data: the
classic multi-pass selection algorithm —

1. one streamed pass folds per-batch (count, min, max) partials;
2. each refinement pass histograms the active [lo, hi] interval of
   every still-open quantile into ``bins`` equal-width bins (ONE
   ``map_batches`` over the data per pass serves ALL open quantiles;
   partials are tiny (n_states x bins) tables);
3. the driver picks each rank's bin, narrows the interval, and adds
   the bins below to that rank's running "below" count;
4. when an interval holds <= ``cap`` rows (or collapses to a single
   float), a final filtered fetch sorts just those rows.

Cost: O(log_bins(range/precision)) streamed passes, O(bins) driver
state per quantile, no shuffle — at 100 TB each pass is a pruned
column scan (pass ``columns=[col]`` at the read). With bins=1024 two
to three passes resolve any double column to under ``cap`` candidates.

The reference has no quantiles (Lucene facets count; they don't rank)
— this is a brief-mandated "novel aggregate" custom operator.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data


def _minmax_partial(b: pa.Table, col: str) -> pa.Table:
    v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[~np.isnan(v)]
    n = len(v)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "lo": pa.array([float(v.min()) if n else math.inf], pa.float64()),
        "hi": pa.array([float(v.max()) if n else -math.inf], pa.float64()),
    })


def distributed_quantile(
    ds: "ray.data.Dataset",
    col: str,
    qs: "list[float]",
    *,
    bins: int = 1024,
    cap: int = 100_000,
    max_passes: int = 16,
) -> dict[float, float]:
    """Exact ``quantile_disc`` values for every q in ``qs`` (nulls/NaNs
    ignored). Returns {q: value}."""
    mm = ds.map_batches(_minmax_partial, batch_format="pyarrow",
                        fn_args=(col,)).to_pandas()
    n = int(mm["n"].sum()) if len(mm) else 0
    if n == 0:
        return {q: float("nan") for q in qs}
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())

    # Per-quantile state: (lo, hi, rank_within_selection, preds) where
    # preds is the CHAIN of (plo, pw, pj) bin predicates accumulated so
    # far. Selection membership is evaluated with the exact same rule
    # that built each histogram (clipped floor-bin index == pj), never
    # with recomputed interval endpoints — float rounding can put a
    # value in bin j yet outside [lo + j*w, lo + (j+1)*w], which would
    # desync the rank bookkeeping from the next pass's row selection.
    state: dict[float, list] = {}
    for q in qs:
        rank = max(0, math.ceil(q * n) - 1)
        state[q] = [glo, ghi, rank, []]
    done: dict[float, float] = {}

    def _select(v: np.ndarray, preds) -> np.ndarray:
        m = (v >= glo) & (v <= ghi)
        for plo, pw, pj in preds:
            idx = np.clip(((v - plo) / pw).astype(np.int64), 0, bins - 1)
            m &= idx == pj
        return v[m]

    for _ in range(max_passes):
        open_qs = [q for q in state if q not in done]
        if not open_qs:
            break
        # zero-width intervals can't be binned further — exact-fetch them
        ivals = [(q, *state[q]) for q in open_qs
                 if (state[q][1] - state[q][0]) / bins > 0.0]
        if not ivals:
            break

        def _hist(b: pa.Table, ivals=ivals) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            sids, bvec, cvec = [], [], []
            for sid, (_q, lo, hi, _r, preds) in enumerate(ivals):
                w = (hi - lo) / bins
                sel = _select(v, preds)
                idx = np.clip(((sel - lo) / w).astype(np.int64), 0, bins - 1)
                h = np.bincount(idx, minlength=bins)
                nz = np.flatnonzero(h)
                sids += [sid] * len(nz)
                bvec += nz.tolist()
                cvec += h[nz].tolist()
            return pa.table({"sid": pa.array(sids, pa.int64()),
                             "bin": pa.array(bvec, pa.int64()),
                             "c": pa.array(cvec, pa.int64())})

        parts = ds.map_batches(_hist, batch_format="pyarrow").to_pandas()
        agg = parts.groupby(["sid", "bin"])["c"].sum()
        all_resolved_small = True
        for sid, (q, lo, hi, rank, preds) in enumerate(ivals):
            h = np.zeros(bins, dtype=np.int64)
            if sid in agg.index.get_level_values(0):
                sub = agg.loc[sid]
                h[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, rank + 1))
            below = int(cum[j - 1]) if j > 0 else 0
            w = (hi - lo) / bins
            # nlo/nhi only steer the NEXT histogram's bin width; row
            # membership is the appended predicate, not the endpoints
            nlo = lo + j * w
            nhi = hi if j == bins - 1 else lo + (j + 1) * w
            state[q] = [nlo, nhi, rank - below, preds + [(lo, w, j)]]
            if h[j] > cap:
                all_resolved_small = False
        if all_resolved_small:
            break

    # final exact fetch for whatever is still open
    open_qs = [q for q in state if q not in done]
    if open_qs:
        ivals = [(q, *state[q]) for q in open_qs]

        def _fetch(b: pa.Table, ivals=ivals) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            sids, vals = [], []
            for sid, (_q, _lo, _hi, _r, preds) in enumerate(ivals):
                sel = _select(v, preds)
                sids += [sid] * len(sel)
                vals += sel.tolist()
            return pa.table({"sid": pa.array(sids, pa.int64()),
                             "v": pa.array(vals, pa.float64())})

        got = ds.map_batches(_fetch, batch_format="pyarrow").to_pandas()
        for sid, (q, _lo, _hi, rank, _preds) in enumerate(ivals):
            vals = np.sort(got.loc[got["sid"] == sid, "v"].to_numpy())
            done[q] = float(vals[rank])
    return done


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable approximate distinct count
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit hash for
    integer keys (public-domain constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_column(arr: pa.Array) -> np.ndarray:
    """uint64 hashes for an Arrow column: integers go through
    splitmix64 vectorized; strings md5-hash once per UNIQUE value
    (dictionary-encode first) and broadcast via indices."""
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return _splitmix64(v.view(np.uint64))
    enc = arr.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(str(u).encode()).digest()[:8], "big")
         for u in uniq), dtype=np.uint64, count=len(uniq))
    return hu[enc.indices.to_numpy(zero_copy_only=False)]


def hll_partial(arr: pa.Array, p: int = 14) -> np.ndarray:
    """HLL register array (uint8[2^p]) for one batch — the mergeable
    partial: merge = elementwise max."""
    h = _hash_column(arr)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    # rho = leading zeros of w within the remaining 64-p bits, + 1
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nz = w != 0
    if nz.any():
        # exact floor(log2) by binary reduction (float log2 rounds up
        # for values within an ulp of a power of two)
        v = w[nz].copy()
        bitpos = np.zeros(len(v), dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            hi = v >> np.uint64(s)
            use = hi != 0
            v = np.where(use, hi, v)
            bitpos += np.where(use, s, 0)
        lz[nz] = np.minimum(63 - bitpos, 64 - p)
    rho = (lz + 1).astype(np.uint8)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimate with small-range (linear counting)
    correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: "ray.data.Dataset", col: str, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) in ONE streamed pass: each batch
    reduces to a 2^p-byte register array (16 KB at p=14), the driver
    folds registers by elementwise max — no shuffle, driver traffic
    O(batches * 2^p), relative error ~1.04/sqrt(2^p) (~0.8% at p=14).
    The sketch union is exact: registers from disjoint partitions merge
    to the same state as a single pass (tested), so partial sketches
    can be persisted per shard and re-merged incrementally."""
    parts = ds.map_batches(
        lambda b: pa.table({"reg": pa.array([hll_partial(b[col], p)
                                             .tobytes()], pa.binary())}),
        batch_format="pyarrow").to_pandas()
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(parts):
        for buf in parts["reg"]:
            np.maximum(reg, np.frombuffer(buf, dtype=np.uint8), out=reg)
    return hll_estimate(reg)


# ---------------------------------------------------------------------------
# Bloom filter — mergeable membership sketch (semi-join pruning)
# ---------------------------------------------------------------------------

def _bloom_positions(h: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """k bit positions per hash via double hashing (h1 + i*h2) —
    standard Kirsch-Mitzenmacher construction; returns (len(h), k)."""
    h1 = h % np.uint64(nbits)
    h2 = (_splitmix64(h) % np.uint64(nbits - 1)) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(nbits)


def bloom_build(ds: "ray.data.Dataset", col: str, *,
                nbits: int = 1 << 23, k: int = 7) -> np.ndarray:
    """Build a bloom filter over ``col`` in one streamed pass: each
    batch reduces to a packed bit array (nbits/8 bytes — 1 MB at the
    2^23 default, good for ~10^6 keys at ~1% FPR), the driver folds by
    bitwise OR. Mergeable like the HLL registers: per-shard blooms
    union losslessly."""
    def _partial(b: pa.Table) -> pa.Table:
        pos = _bloom_positions(_hash_column(b[col]), nbits, k)
        bits = np.zeros(nbits, dtype=bool)
        bits[pos.reshape(-1).astype(np.int64)] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    acc = np.zeros(nbits // 8, dtype=np.uint8)
    for buf in parts["bits"]:
        np.bitwise_or(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
    return acc


def bloom_filter_ds(ds: "ray.data.Dataset", col: str, bloom: np.ndarray,
                    *, k: int = 7, invert: bool = False
                    ) -> "ray.data.Dataset":
    """Keep rows whose ``col`` MAY be in the bloom (no false negatives;
    false positives at the filter's FPR). The packed filter broadcasts
    once via ``ray.put`` — a shared-memory read per task, not a
    re-ship. The standard bloom-pruned semi-join: filter the huge probe
    side BEFORE the join shuffle."""
    import ray as _ray

    nbits = len(bloom) * 8
    ref = _ray.put(bloom)

    def _f(b: pa.Table) -> pa.Table:
        bits = np.unpackbits(_ray.get(ref)).astype(bool)
        pos = _bloom_positions(_hash_column(b[col]), nbits, k)
        hit = bits[pos.astype(np.int64)].all(axis=1)
        return b.filter(pa.array(~hit if invert else hit))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation
# ---------------------------------------------------------------------------

def cms_partial(arr: pa.Array, *, width: int = 1 << 16, depth: int = 4
                ) -> np.ndarray:
    """Count-min table (int64[depth, width]) for one batch — the
    mergeable partial: merge = elementwise SUM (each row d uses an
    independent seeded splitmix64 of the value hash)."""
    h = _hash_column(arr)
    t = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        hd = _splitmix64(h ^ np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = (hd % np.uint64(width)).astype(np.int64)
        np.add.at(t[d], idx, 1)
    return t


def cms_build(ds: "ray.data.Dataset", col: str, *,
              width: int = 1 << 16, depth: int = 4) -> np.ndarray:
    """Build a count-min sketch over ``col`` in one streamed pass:
    per-batch tables fold by elementwise sum on the driver (2 MB at
    the 4x65536 default). Overestimate-only error: with n total rows,
    est - true <= 2n/width with probability 1 - 2^-depth."""
    parts = ds.map_batches(
        lambda b: pa.table({"t": pa.array(
            [cms_partial(b[col], width=width, depth=depth).tobytes()],
            pa.binary())}),
        batch_format="pyarrow").to_pandas()
    acc = np.zeros((depth, width), dtype=np.int64)
    for buf in parts["t"]:
        acc += np.frombuffer(buf, dtype=np.int64).reshape(depth, width)
    return acc


def cms_query(sketch: np.ndarray, values: pa.Array) -> np.ndarray:
    """Estimated frequencies (int64, >= true count) for ``values``."""
    depth, width = sketch.shape
    h = _hash_column(values)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        hd = _splitmix64(h ^ np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = (hd % np.uint64(width)).astype(np.int64)
        np.minimum(est, sketch[d, idx], out=est)
    return est


# ---------------------------------------------------------------------------
# IQR outlier filter — composition of the exact quantiles
# ---------------------------------------------------------------------------

def iqr_filter(ds: "ray.data.Dataset", col: str, *, factor: float = 1.5,
               cap: int = 100_000) -> "tuple[ray.data.Dataset, float, float]":
    """Tukey's fences: keep rows with ``col`` in [q1 - factor*IQR,
    q3 + factor*IQR] where q1/q3 are EXACT discrete quartiles from
    :func:`distributed_quantile` (multi-pass selection — no sort).
    Returns (filtered dataset, lo, hi); the filter itself is one
    stateless streamed pass. Nulls/NaNs are dropped (they compare
    false)."""
    qs = distributed_quantile(ds, col, [0.25, 0.75], cap=cap)
    q1, q3 = qs[0.25], qs[0.75]
    iqr = q3 - q1
    lo, hi = q1 - factor * iqr, q3 + factor * iqr

    def _keep(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.filter(pa.array((v >= lo) & (v <= hi)))

    return ds.map_batches(_keep, batch_format="pyarrow"), lo, hi
