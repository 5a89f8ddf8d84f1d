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
    n = int(mm["n"].sum())
    if n == 0:
        return {q: float("nan") for q in qs}
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())

    # state per quantile: (lo, hi, rank_within_interval)
    state = {}
    for q in qs:
        rank = max(0, math.ceil(q * n) - 1)
        state[q] = [glo, ghi, rank]
    done: dict[float, float] = {}

    for _ in range(max_passes):
        open_qs = [q for q in state if q not in done]
        if not open_qs:
            break
        # collapsed intervals resolve immediately
        for q in open_qs:
            lo, hi, _r = state[q]
            if lo == hi or (hi - lo) / bins == 0.0:
                done[q] = lo
        open_qs = [q for q in open_qs if q not in done]
        if not open_qs:
            break
        ivals = [(q, *state[q]) for q in open_qs]

        def _hist(b: pa.Table, ivals=ivals) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            sids, bvec, cvec = [], [], []
            for sid, (_q, lo, hi, _r) in enumerate(ivals):
                w = (hi - lo) / bins
                sel = v[(v >= lo) & (v <= hi)]
                idx = np.minimum((
                    (sel - lo) / w).astype(np.int64), bins - 1)
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
        for sid, (q, lo, hi, rank) in enumerate(ivals):
            h = np.zeros(bins, dtype=np.int64)
            if sid in agg.index.get_level_values(0):
                sub = agg.loc[sid]
                h[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, rank + 1))
            below = int(cum[j - 1]) if j > 0 else 0
            w = (hi - lo) / bins
            nlo = lo + j * w
            nhi = hi if j == bins - 1 else lo + (j + 1) * w
            state[q] = [nlo, nhi, rank - below]
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
            for sid, (_q, lo, hi, _r) in enumerate(ivals):
                sel = v[(v >= lo) & (v <= hi)]
                sids += [sid] * len(sel)
                vals += sel.tolist()
            return pa.table({"sid": pa.array(sids, pa.int64()),
                             "v": pa.array(vals, pa.float64())})

        got = ds.map_batches(_fetch, batch_format="pyarrow").to_pandas()
        for sid, (q, lo, hi, rank) in enumerate(ivals):
            vals = np.sort(got.loc[got["sid"] == sid, "v"].to_numpy())
            done[q] = float(vals[rank])
    return done
