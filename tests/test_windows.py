"""Windowed aggregate + as-of join (ops/windows.py) — brute-force
pandas oracles plus null/edge semantics."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture()
def ev_ds(ray_session):
    import ray.data

    rows = []
    rng = np.random.default_rng(4)
    for i in range(200):
        rows.append({"event_id": i, "user_id": int(rng.integers(5)),
                     "ts": _ts(int(rng.integers(1, 9)),
                               int(rng.integers(24))),
                     "value": float(rng.uniform(0, 10))})
    return ray.data.from_items(rows)


def test_tumbling_window_agg_matches_pandas(ev_ds):
    from icat_lucene_ray.ops.windows import tumbling_window_agg

    got = tumbling_window_agg(ev_ds, key_col="user_id", ts_col="ts",
                              val_col="value").to_pandas()
    got = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pdf = ev_ds.to_pandas()
    pdf["window_start"] = pdf["ts"].dt.floor("D")
    want = (pdf.groupby(["user_id", "window_start"], as_index=False)
            ["value"].sum().rename(columns={"value": "total_value"})
            .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert np.allclose(got["total_value"], want["total_value"], rtol=1e-12)


def test_asof_join_backward_semantics(ray_session):
    import ray.data

    from icat_lucene_ray.ops.windows import asof_join

    left = ray.data.from_items([
        {"event_id": 1, "k": 1, "ts": _ts(5)},
        {"event_id": 2, "k": 1, "ts": _ts(2)},
        {"event_id": 3, "k": 1, "ts": _ts(1)},   # before any right row
        {"event_id": 4, "k": 2, "ts": _ts(9)},   # key with no right rows
        {"event_id": 5, "k": 1, "ts": _ts(3)},   # exactly at a right ts
    ])
    right = ray.data.from_items([
        {"k": 1, "rts": _ts(3), "price": 30.0},
        {"k": 1, "rts": _ts(4), "price": 40.0},
    ])
    out = (asof_join(left, right, key_col="k", left_ts="ts",
                     right_ts="rts", right_vals={"price": "last_price"},
                     left_cols=["event_id"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    got = dict(zip(out["event_id"], out["last_price"]))
    assert got[1] == 40.0      # latest <= day5
    assert np.isnan(got[2])    # day2 before first right row
    assert np.isnan(got[3])
    assert np.isnan(got[4])    # no right rows for key 2 at all
    assert got[5] == 30.0      # ties at equal ts match (<=)
    assert len(out) == 5       # every left row survives (left join)


def test_sessionize_gap_semantics(ray_session):
    """Strictly-greater gap starts a session; an exact-gap tie does
    not. Keys never mix sessions, whatever bucket they hash to."""
    import numpy as np
    import pyarrow as pa
    import ray

    from icat_lucene_ray.ops.windows import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = np.timedelta64(60, "s")
    rows = [
        # user 1: 0min, 30min (== gap, same session), 61min (new)
        (0, 1, base), (1, 1, base + 30 * mins), (2, 1, base + 91 * mins),
        # user 2: single event
        (3, 2, base),
        # user 3: two sessions split by a big gap
        (4, 3, base), (5, 3, base + 500 * mins),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = sessionize(ray.data.from_arrow(t), gap=30 * 60, num_buckets=4) \
        .to_pandas().sort_values("event_id")
    assert out["session_seq"].tolist() == [0, 0, 1, 0, 0, 1]


def test_sessionize_matches_window_sql(ray_session):
    """Full-table equivalence with the DuckDB window formulation at
    sf0.001 (the driver checks sf0.01)."""
    import duckdb
    import ray.data

    from icat_lucene_ray.ops.windows import sessionize

    src = "/root/testdata/sf0.001/events.parquet"
    out = sessionize(
        ray.data.read_parquet(src, columns=["event_id", "user_id", "ts"]),
        gap=30 * 60).to_pandas().sort_values("event_id")
    ref = duckdb.sql(f"""
        WITH o AS (
          SELECT event_id, ts, user_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
          FROM '{src}'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_id,
          sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
        FROM o ORDER BY event_id""").fetchdf()
    assert (out["session_seq"].to_numpy()
            == ref["session_seq"].to_numpy()).all()
