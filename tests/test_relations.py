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
