"""Windowed / temporal operators — tumbling-window aggregation and
as-of joins, Ray-Data-first.

These are the "custom operators" of the task brief (windowed aggregate,
as-of join): both compose from ``map_batches`` + ``groupby`` —
no bespoke task graph.

- :func:`tumbling_window_agg` — floor each row's timestamp to its
  window start inside ``map_batches`` (vectorized ``floor_temporal``),
  then ONE hash aggregate over (key, window). Pre-aggregation happens
  inside Ray's aggregate combiner, so the shuffle carries one row per
  (key, window) per block.
- :func:`asof_join` — classic as-of (each left row matched to the
  latest right row with ``ts_r <= ts_l`` of the same key): tag the two
  sides, union, ``groupby(key).map_groups`` with a vectorized
  searchsorted inside each group. Partitioning assumption (documented
  per the custom-operator rule): one key's rows fit a worker — the
  standard hash-partitioned as-of; salt hot keys upstream if a single
  key's history is unbounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    val_col: str,
    unit: str = "day",
    out_col: str = "total_value",
) -> ray.data.Dataset:
    """Sum ``val_col`` per (key, tumbling window of ``unit``). Returns a
    Dataset with (key_col, window_start, out_col)."""
    from ray.data.aggregate import Sum

    def add_window(b: pa.Table) -> pa.Table:
        w = pc.floor_temporal(b[ts_col], unit=unit)
        return pa.table({
            key_col: b[key_col],
            "window_start": w,
            val_col: b[val_col],
        })

    return (ds.map_batches(add_window, batch_format="pyarrow")
              .groupby([key_col, "window_start"])
              .aggregate(Sum(val_col, alias_name=out_col)))


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_vals: dict[str, str],
    left_cols: list[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Backward as-of join: each left row gets the right row with the
    LARGEST ``right_ts <= left_ts`` for the same key (null columns when
    no prior right row exists). ``right_vals`` maps right column ->
    output column name. Right (key, ts) pairs should be unique for a
    deterministic result (pre-aggregate ties upstream).

    Shape: keys bucket by multiplicative hash; each group call runs ONE
    C-speed ``pd.merge_asof(..., by=key)`` over its whole bucket — one
    Python call per bucket, never per key. Partitioning assumption
    (documented per the custom-operator rule): a bucket's rows fit a
    worker; raise ``num_buckets`` with corpus size."""
    lcols = list(left_cols or [c for c in left.schema().names
                               if c not in (key_col, left_ts)])

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], "__ts": b[left_ts],
                "__side": pa.array(np.zeros(b.num_rows, np.int8))}
        for c in lcols:
            cols[f"l__{c}"] = b[c]
        for _rc, out in right_vals.items():
            cols[f"r__{out}"] = pa.nulls(b.num_rows)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], "__ts": b[right_ts],
                "__side": pa.array(np.ones(b.num_rows, np.int8))}
        for c in lcols:
            cols[f"l__{c}"] = pa.nulls(b.num_rows)
        for rc, out in right_vals.items():
            cols[f"r__{out}"] = b[rc]
        return pa.table(cols)

    # align null-column types across the two sides (pa.nulls is
    # type-less null): cast both to one explicit arrow schema
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    fields = [pa.field(key_col, l_schema.field(key_col).type),
              pa.field("__ts", l_schema.field(left_ts).type),
              pa.field("__side", pa.int8())]
    fields += [pa.field(f"l__{c}", l_schema.field(c).type) for c in lcols]
    fields += [pa.field(f"r__{out}", r_schema.field(rc).type)
               for rc, out in right_vals.items()]
    schema = pa.schema(fields)

    def cast_to(b: pa.Table) -> pa.Table:
        b = b.cast(schema)
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = ((k * 2654435761) & 0x7FFFFFFF) % num_buckets
        return b.append_column("_abkt", pa.array(bkt.astype(np.int64)))

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .map_batches(cast_to, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow")
                     .map_batches(cast_to, batch_format="pyarrow")))

    def match_group(g: pa.Table) -> pa.Table:
        import pandas as pd

        side = g["__side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        ldf = pa.table(
            {key_col: lt[key_col], "__ts": lt["__ts"],
             **{f"l__{c}": lt[f"l__{c}"] for c in lcols}}).to_pandas()
        ldf["__pos"] = np.arange(len(ldf))
        rdf = pa.table(
            {key_col: rt[key_col], "__ts": rt["__ts"],
             **{f"r__{out}": rt[f"r__{out}"]
                for out in right_vals.values()}}).to_pandas()
        ldf = ldf.sort_values("__ts", kind="stable")
        rdf = rdf.sort_values("__ts", kind="stable")
        if len(rdf):
            j = pd.merge_asof(ldf, rdf, on="__ts", by=key_col,
                              direction="backward")
        else:
            j = ldf.copy()
            for out in right_vals.values():
                j[f"r__{out}"] = None
        j = j.sort_values("__pos", kind="stable")
        cols = {key_col: pa.array(j[key_col]),
                left_ts: pa.Array.from_pandas(
                    j["__ts"], type=schema.field("__ts").type)}
        for c in lcols:
            cols[c] = pa.Array.from_pandas(
                j[f"l__{c}"], type=schema.field(f"l__{c}").type)
        for _rc, out in right_vals.items():
            cols[out] = pa.Array.from_pandas(
                j[f"r__{out}"], type=schema.field(f"r__{out}").type)
        return pa.table(cols)

    return tagged.groupby("_abkt").map_groups(match_group,
                                              batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: "np.timedelta64 | int" = 30 * 60,
    out_col: str = "session_seq",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gap-based sessionization: events of one key sorted by
    (``ts_col``, ``id_col``) start a NEW session whenever the gap to
    the previous event strictly exceeds ``gap`` (seconds, or a
    ``np.timedelta64``). Appends 0-based ``out_col`` per key.

    Shape: keys bucket by ``hash(key) % num_buckets`` so ONE vectorized
    group call handles ~keys/num_buckets keys at once (lexsort by
    (key, ts, id), per-key diff + cumsum via boundary reset) — one
    Python call per bucket, never per key (the bucketed-groupby
    discipline; per-key map_groups is O(keys) interpreter overhead).
    Partitioning assumption (documented per the custom-operator rule):
    a bucket's rows fit a worker — raise ``num_buckets`` with corpus
    size; one KEY's events always co-locate regardless.
    """
    gap_us = (np.timedelta64(gap, "s") if isinstance(gap, (int, np.integer))
              else np.timedelta64(gap)) // np.timedelta64(1, "us")

    def _bucket(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # Knuth multiplicative hash — spreads sequential ids
        bkt = ((k * 2654435761) & 0x7FFFFFFF) % num_buckets
        return b.append_column("_sbkt", pa.array(bkt.astype(np.int64)))

    def _assign(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            pa.table({"k": g[key_col], "t": g[ts_col], "i": g[id_col]}),
            sort_keys=[("k", "ascending"), ("t", "ascending"),
                       ("i", "ascending")])
        g = g.take(order)
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        n = len(k)
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            same = k[1:] == k[:-1]
            brk[1:] = np.where(same & (ts[1:] - ts[:-1] <= gap_us), 0, 1)
        seq = np.cumsum(brk)
        # rebase per key: subtract the cumsum value at each key's start
        starts = np.flatnonzero(brk & np.r_[True, k[1:] != k[:-1]])
        base = np.zeros(n, dtype=np.int64)
        base[starts] = seq[starts]
        np.maximum.accumulate(base, out=base)
        return g.append_column(out_col,
                               pa.array(seq - base)).drop_columns(["_sbkt"])

    return ds.map_batches(_bucket, batch_format="pyarrow") \
             .groupby("_sbkt").map_groups(_assign, batch_format="pyarrow")
