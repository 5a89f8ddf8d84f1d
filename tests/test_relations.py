"""J2 relationship denormalization (updateByRelation,
Lucene.java:1846-1939) + cascade delete — broadcast-join semantics
checked against a pandas oracle on the TPC-H-ish tables."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def nation_tbl():
    return pq.read_table(f"{SF}/nation.parquet")


def test_update_by_relation_matches_join(ray_session, nation_tbl):
    from icat_lucene_ray.ops.relations import update_by_relation

    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    out = update_by_relation(
        cust, nation_tbl, child_key="c_nationkey", parent_key="n_nationkey",
        field_mapping={"n_name": "nation_name", "n_regionkey": "region_key"},
    ).to_pandas().sort_values("c_custkey").reset_index(drop=True)

    cdf = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    ndf = nation_tbl.to_pandas()
    exp = cdf.merge(ndf, left_on="c_nationkey", right_on="n_nationkey",
                    how="left").sort_values("c_custkey").reset_index(drop=True)
    assert (out["nation_name"] == exp["n_name"]).all()
    assert (out["region_key"] == exp["n_regionkey"]).all()
    assert len(out) == len(cdf)


def test_update_by_relation_missing_parent_is_null(ray_session, nation_tbl):
    from icat_lucene_ray.ops.relations import update_by_relation

    # drop half the parents: children of dropped parents get null
    keep = nation_tbl.slice(0, max(1, nation_tbl.num_rows // 2))
    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    out = update_by_relation(
        cust, keep, child_key="c_nationkey", parent_key="n_nationkey",
        field_mapping={"n_name": "nation_name"},
    ).to_pandas()
    kept_keys = set(keep["n_nationkey"].to_pylist())
    miss = ~out["c_nationkey"].isin(kept_keys)
    assert out.loc[miss, "nation_name"].isna().all()
    assert out.loc[~miss, "nation_name"].notna().all()


def test_cascade_delete(ray_session):
    from icat_lucene_ray.ops.relations import cascade_delete

    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    cdf = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    dead = sorted(cdf["c_nationkey"].unique())[:3]
    out = cascade_delete(cust, [int(d) for d in dead],
                         child_key="c_nationkey").to_pandas()
    assert not out["c_nationkey"].isin(dead).any()
    assert len(out) == int((~cdf["c_nationkey"].isin(dead)).sum())


def test_scored_semi_join_modes(ray_session, built_index, oracle, pages_table):
    """J1 scored join: per-key avg/max/total of from-side BM25 vs a
    brute-force recomputation from the oracle."""
    import numpy as np
    import pyarrow as pa

    from icat_lucene_ray.ops.relations import scored_semi_join
    from icat_lucene_ray.query import Index, Term
    from tests.test_query import _terms_by_df

    idx = Index(built_index.root)
    _, mid, _ = _terms_by_df(oracle)
    probe = mid[0]
    hits, _scored = oracle._eval(Term(probe))
    lang_of = dict(zip((int(d) for d in oracle.doc_ids),
                       oracle.meta["lang"]))
    per_key: dict = {}
    for d, s in hits.items():
        per_key.setdefault(lang_of[d], []).append(s)
    for mode, agg in [("avg", np.mean), ("max", np.max), ("total", np.sum)]:
        want_key = {k: float(agg(v)) for k, v in per_key.items()}
        expected = sorted(
            ((d, want_key[lang_of[d]]) for d in lang_of
             if lang_of[d] in want_key),
            key=lambda x: (-x[1], x[0]))[:10]
        got = scored_semi_join(idx, Term(probe), "lang", idx,
                               k=10, mode=mode)
        assert got["doc_id"].to_pylist() == [d for d, _ in expected], mode
        assert np.allclose(got["score"].to_numpy(),
                           [s for _, s in expected], rtol=1e-9)


def test_join_fetch_cap(ray_session, built_index, oracle):
    """J3: per-hit inline fetch from another index, capped at 100
    (Lucene.java:891)."""
    import pyarrow as pa

    from icat_lucene_ray.ops.relations import join_fetch
    from icat_lucene_ray.query import Index, MatchAll

    idx = Index(built_index.root)
    r = idx.search(MatchAll(), k=2, fields=["lang"])
    # joined index = the SAME index here; Term(lang) matches that
    # language's docs via the text?? -> use a fabricated hits table with
    # a term we control instead: every doc whose text contains the term
    hits = r.table
    out = join_fetch(hits, "lang", idx, max_joined=5)
    assert set(out.column_names) == {"doc_id", "joined_doc_id"}
    import collections

    per = collections.Counter(out["doc_id"].to_pylist())
    assert all(v <= 5 for v in per.values())


def test_join_fetch_one_query_per_distinct_key(ray_session, built_index):
    """Hits sharing a join key must share ONE to-index query (the
    reference re-runs it per hit; ours is O(unique keys))."""
    import pyarrow as pa

    from icat_lucene_ray.ops.relations import join_fetch
    from icat_lucene_ray.query import Index

    idx = Index(built_index.root)
    calls: list[str] = []
    orig = idx._eval

    def counting_eval(q, *a, **kw):
        calls.append(q.text)
        return orig(q, *a, **kw)

    idx._eval = counting_eval
    hits = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "lang": pa.array(["en", "en", "de", "en", "de", "fr"]),
    })
    out = join_fetch(hits, "lang", idx, max_joined=3)
    assert len(calls) == 3  # en, de, fr — not 6
    # identical keys got identical joined sets
    by_hit = {}
    for d, j in zip(out["doc_id"].to_pylist(),
                    out["joined_doc_id"].to_pylist()):
        by_hit.setdefault(d, []).append(j)
    assert by_hit.get(1) == by_hit.get(2) == by_hit.get(4)


def test_hash_join_semantics(ray_session):
    """Inner/left equi-join vs a pandas oracle, including duplicate
    keys (per-key cartesian) and unmatched left rows (nulls on left
    join, dropped on inner)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray

    from icat_lucene_ray.ops.relations import hash_join

    lt = pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                   "lv": pa.array(["a", "b", "c", "d", "e"])})
    rt = pa.table({"k": pa.array([2, 2, 3, 4], pa.int64()),
                   "rv": pa.array([10.0, 20.0, 30.0, 40.0])})
    lds, rds = ray.data.from_arrow(lt), ray.data.from_arrow(rt)

    for how in ("inner", "left"):
        got = hash_join(lds, rds, on="k", how=how, num_buckets=4) \
            .to_pandas().sort_values(["k", "lv", "rv"]) \
            .reset_index(drop=True)
        want = pd.merge(lt.to_pandas(), rt.to_pandas(), on="k", how=how) \
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        assert got["k"].tolist() == want["k"].tolist(), how
        assert got["lv"].tolist() == want["lv"].tolist(), how
        assert np.array_equal(got["rv"].to_numpy(), want["rv"].to_numpy(),
                              equal_nan=True), how

    with pytest.raises(ValueError, match="colliding"):
        hash_join(lds, rds.map_batches(
            lambda b: b.rename_columns(["k", "lv"]),
            batch_format="pyarrow"), on="k")


def test_hash_join_right_on(ray_session):
    import pyarrow as pa
    import ray

    from icat_lucene_ray.ops.relations import hash_join

    lt = pa.table({"a": pa.array([1, 2], pa.int64()),
                   "x": pa.array([5, 6], pa.int64())})
    rt = pa.table({"b": pa.array([2, 3], pa.int64()),
                   "y": pa.array([7, 8], pa.int64())})
    got = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    on="a", right_on="b", how="inner").to_pandas()
    assert got.to_dict("records") == [{"a": 2, "x": 6, "y": 7}]


def test_hash_join_guards(ray_session):
    """Key-name collisions with payload columns and bloom+left are
    rejected loudly instead of silently corrupting the output."""
    import pyarrow as pa
    import pytest
    import ray

    from icat_lucene_ray.ops.relations import hash_join

    lt = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                       "x": pa.array([5], pa.int64())}))
    rt = ray.data.from_arrow(pa.table({"b": pa.array([1], pa.int64()),
                                       "k": pa.array([9], pa.int64())}))
    # right payload column named like the join key output
    with pytest.raises(ValueError, match="collides with the join key"):
        hash_join(lt, rt, on="k", right_on="b")
    with pytest.raises(ValueError, match="left-join"):
        hash_join(lt, rt, on="k", right_on="b", how="left",
                  right_cols=["b"], bloom_prefilter=True)
