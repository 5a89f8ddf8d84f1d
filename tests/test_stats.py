"""Exact distributed quantiles (iterative histogram narrowing) vs
numpy/DuckDB oracles, including the forced multi-pass path."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from icat_lucene_ray.ops.stats import distributed_quantile


def _disc(vals: np.ndarray, q: float) -> float:
    """DuckDB quantile_disc: 0-based index max(0, ceil(q*n)-1)."""
    import math

    s = np.sort(vals)
    return float(s[max(0, math.ceil(q * len(s)) - 1)])


@pytest.fixture(scope="module")
def vals_ds(ray_session):
    rng = np.random.default_rng(11)
    # lognormal (skewed) + exact duplicates + a NaN + negatives
    v = np.concatenate([
        rng.lognormal(0, 2, 5000),
        np.full(500, 7.25),
        -rng.lognormal(0, 1, 1000),
        [np.nan],
    ])
    t = pa.table({"value": pa.array(v, pa.float64())})
    return ray.data.from_arrow(t), v[~np.isnan(v)]


QS = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]


def test_exact_vs_numpy_multi_pass(vals_ds):
    ds, v = vals_ds
    got = distributed_quantile(ds, "value", QS, cap=50, bins=64)
    for q in QS:
        assert got[q] == _disc(v, q), q


def test_exact_single_pass_big_cap(vals_ds):
    ds, v = vals_ds
    got = distributed_quantile(ds, "value", QS, cap=10_000_000)
    for q in QS:
        assert got[q] == _disc(v, q), q


def test_boundary_values_never_desync(ray_session):
    """Adversarial values ON refinement-bin boundaries: selection uses
    the exact binning predicate of the previous pass, never recomputed
    interval endpoints (float rounding can place a value in bin j yet
    outside [lo + j*w, lo + (j+1)*w]). Tiny cap/bins force many passes;
    clusters sit exactly at lo + j*w for awkward widths."""
    rng = np.random.default_rng(3)
    lo, hi, bins = 0.1, 0.1 + 0.7 / 3, 16  # non-dyadic width
    w = (hi - lo) / bins
    edges = lo + np.arange(bins + 1) * w
    v = np.concatenate([
        np.repeat(edges, 40),                      # exactly on boundaries
        edges + np.finfo(np.float64).eps * edges,  # one ulp above
        edges - np.finfo(np.float64).eps * edges,  # one ulp below
        rng.uniform(lo, hi, 2000),
    ])
    ds = ray.data.from_arrow(pa.table({"value": pa.array(v, pa.float64())}))
    got = distributed_quantile(ds, "value", QS, cap=20, bins=8)
    for q in QS:
        assert got[q] == _disc(v, q), q


def test_constant_column(ray_session):
    t = pa.table({"value": pa.array([3.5] * 1000, pa.float64())})
    got = distributed_quantile(ray.data.from_arrow(t), "value",
                               [0.1, 0.5, 0.99], cap=10)
    assert set(got.values()) == {3.5}


def test_all_null(ray_session):
    t = pa.table({"value": pa.array([None, None], pa.float64())})
    got = distributed_quantile(ray.data.from_arrow(t), "value", [0.5])
    assert np.isnan(got[0.5])


def test_matches_duckdb(ray_session):
    import duckdb

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["value"])
    got = distributed_quantile(ds, "value", [0.5, 0.95], cap=20)
    for q in (0.5, 0.95):
        ref = duckdb.sql(
            f"SELECT quantile_disc(value, {q}) FROM '{src}'").fetchone()[0]
        assert got[q] == pytest.approx(float(ref), abs=0), q


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_error_bound(ray_session):
    """~0.8% typical error at p=14; assert a generous 3% bound on 100k
    distinct int keys with heavy duplication."""
    from icat_lucene_ray.ops.stats import hll_distinct

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 100_000, 400_000)
    true = len(np.unique(keys))
    t = pa.table({"k": pa.array(keys, pa.int64())})
    est = hll_distinct(ray.data.from_arrow(t).repartition(8), "k")
    assert abs(est - true) / true < 0.03, (est, true)


def test_hll_merge_equals_single_pass():
    """Register union over disjoint partitions == one-pass registers
    (the property that makes per-shard sketch persistence sound)."""
    from icat_lucene_ray.ops.stats import hll_partial

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5000, 20_000)
    a = pa.array(keys[:7000], pa.int64())
    b = pa.array(keys[7000:], pa.int64())
    merged = np.maximum(hll_partial(a), hll_partial(b))
    single = hll_partial(pa.array(keys, pa.int64()))
    assert np.array_equal(merged, single)


def test_hll_string_keys(ray_session):
    from icat_lucene_ray.ops.stats import hll_distinct

    vals = [f"host{i % 700}.example.com" for i in range(30_000)]
    t = pa.table({"k": pa.array(vals, pa.string())})
    est = hll_distinct(ray.data.from_arrow(t), "k")
    assert abs(est - 700) / 700 < 0.05, est


def test_hll_small_range_linear_counting(ray_session):
    """A handful of distincts hits the linear-counting correction and
    must come out near-exact."""
    from icat_lucene_ray.ops.stats import hll_distinct

    t = pa.table({"k": pa.array(list(range(37)) * 100, pa.int64())})
    est = hll_distinct(ray.data.from_arrow(t), "k")
    assert round(est) == 37, est


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    from icat_lucene_ray.ops.stats import bloom_build, bloom_filter_ds

    rng = np.random.default_rng(9)
    members = rng.choice(10_000_000, 50_000, replace=False)
    bloom = bloom_build(
        ray.data.from_arrow(pa.table({"k": pa.array(members, pa.int64())}))
        .repartition(4), "k")
    # probe: all members + disjoint non-members
    non = members.max() + 1 + np.arange(50_000)
    probe = pa.table({"k": pa.array(np.concatenate([members, non]),
                                    pa.int64())})
    kept = bloom_filter_ds(ray.data.from_arrow(probe), "k", bloom) \
        .to_pandas()["k"].to_numpy()
    member_set = set(members.tolist())
    assert member_set <= set(kept.tolist())          # no false negatives
    fpr = (len(kept) - len(members)) / len(non)
    assert fpr < 0.02, fpr                           # ~1% at these params


def test_bloom_pruned_join_identical(ray_session):
    """bloom_prefilter must not change the inner-join result."""
    from icat_lucene_ray.ops.relations import hash_join

    rng = np.random.default_rng(13)
    lt = pa.table({"k": pa.array(rng.integers(0, 100_000, 20_000),
                                 pa.int64()),
                   "lv": pa.array(np.arange(20_000), pa.int64())})
    rt = pa.table({"k": pa.array(rng.choice(100_000, 300, replace=False),
                                 pa.int64()),
                   "rv": pa.array(np.arange(300), pa.int64())})
    base = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     on="k", how="inner").to_pandas() \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    pruned = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                       on="k", how="inner", bloom_prefilter=True) \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert base.equals(pruned)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def test_cms_overestimate_only_and_bound(ray_session):
    from icat_lucene_ray.ops.stats import cms_build, cms_query

    rng = np.random.default_rng(21)
    # zipf-ish: hot keys plus a long tail
    keys = np.concatenate([
        np.repeat(np.arange(10), 5000),          # 10 hot keys x 5000
        rng.integers(100, 2_000_000, 200_000)])  # tail
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    sk = cms_build(ds.repartition(6), "k")
    probe = pa.array(np.arange(10), pa.int64())
    est = cms_query(sk, probe)
    true = np.array([(keys == i).sum() for i in range(10)])
    assert (est >= true).all()                    # never underestimates
    # eps = 2/width -> additive error bound 2n/width
    bound = 2 * len(keys) / sk.shape[1]
    assert (est - true <= bound).all(), (est, true)


def test_cms_merge_equals_single_pass():
    from icat_lucene_ray.ops.stats import cms_partial

    rng = np.random.default_rng(23)
    keys = rng.integers(0, 1000, 30_000)
    a = pa.array(keys[:11_000], pa.int64())
    b = pa.array(keys[11_000:], pa.int64())
    merged = cms_partial(a) + cms_partial(b)
    single = cms_partial(pa.array(keys, pa.int64()))
    assert np.array_equal(merged, single)


def test_cms_string_keys(ray_session):
    from icat_lucene_ray.ops.stats import cms_build, cms_query

    vals = ["hot"] * 5000 + [f"cold{i}" for i in range(20_000)]
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    sk = cms_build(ds, "k")
    est = cms_query(sk, pa.array(["hot"], pa.string()))
    assert 5000 <= est[0] <= 5000 + 2 * len(vals) / sk.shape[1]


def test_iqr_filter(ray_session):
    """Tukey fences vs a numpy reference, outliers planted on both
    sides."""
    from icat_lucene_ray.ops.stats import iqr_filter

    rng = np.random.default_rng(31)
    body = rng.normal(50, 5, 5000)
    vals = np.concatenate([body, [1e6, -1e6, 500.0, -400.0]])
    t = pa.table({"id": pa.array(np.arange(len(vals)), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    kept, lo, hi = iqr_filter(ray.data.from_arrow(t), "v", cap=50)
    import math

    s = np.sort(vals)
    q1 = s[max(0, math.ceil(0.25 * len(s)) - 1)]
    q3 = s[max(0, math.ceil(0.75 * len(s)) - 1)]
    assert lo == q1 - 1.5 * (q3 - q1) and hi == q3 + 1.5 * (q3 - q1)
    got = np.sort(kept.to_pandas()["v"].to_numpy())
    want = np.sort(vals[(vals >= lo) & (vals <= hi)])
    assert np.array_equal(got, want)
    assert 1e6 not in got and -1e6 not in got
