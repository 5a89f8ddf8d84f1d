"""Deterministic stratified sampling + token-budget packing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.ops.sampling import (
    KNUTH,
    pack_token_budget,
    stratified_sample,
)


@pytest.fixture()
def table():
    rng = np.random.default_rng(11)
    n = 2000
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n).tolist()),
        "n_tokens": pa.array(rng.integers(10, 500, n), pa.int64()),
    })


def test_stratified_sample_deterministic_and_partition_invariant(
        ray_session, table):
    import ray.data

    fr = {"en": 0.5, "de": 0.2}
    a = stratified_sample(ray.data.from_arrow(table), "lang", fr,
                          default_frac=0.05).to_pandas()
    b = stratified_sample(
        ray.data.from_arrow(table).repartition(7), "lang", fr,
        default_frac=0.05).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # matches the scalar decision rule exactly
    ids = table["doc_id"].to_numpy()
    langs = table["lang"].to_pylist()
    expect = [int(i) for i, l in zip(ids, langs)
              if (int(i) * int(KNUTH)) % (1 << 32)
              < {"en": .5, "de": .2}.get(l, .05) * (1 << 32)]
    assert sorted(a["doc_id"]) == expect
    # rates land near the requested fractions
    got = a.groupby("lang").size()
    n_en = sum(1 for l in langs if l == "en")
    assert abs(got.get("en", 0) / n_en - 0.5) < 0.08


def test_pack_token_budget_matches_sequential_packer(ray_session, table):
    import ray.data

    budget = 3000
    out = pack_token_budget(
        ray.data.from_arrow(table).repartition(5), "n_tokens", budget
    ).to_pandas().sort_values("doc_id")
    # sequential reference: exclusive running total // budget
    t = table.to_pandas().sort_values("doc_id")
    excl = t["n_tokens"].cumsum() - t["n_tokens"]
    expect = (excl // budget).astype(int).tolist()
    assert out["chunk_id"].astype(int).tolist() == expect
    # chunks are contiguous id ranges with ~budget tokens each
    sizes = t.groupby(expect)["n_tokens"].sum()
    assert (sizes.iloc[:-1] >= budget - 500).all()


def test_group_topk_matches_pandas(ray_session):
    """Per-key top-k with deterministic tie-break vs a pandas
    row_number oracle, across bucket and batch boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray

    from icat_lucene_ray.ops.sampling import group_topk

    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "grp": pa.array([f"g{int(x)}" for x in rng.integers(0, 20, n)]),
        # coarse scores force ties -> tie-break must be exercised
        "score": pa.array(rng.integers(0, 5, n).astype(float)),
    })
    got = group_topk(ray.data.from_arrow(t).repartition(7),
                     "grp", "score", 4, id_col="doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pdf = t.to_pandas()
    pdf = pdf.sort_values(["grp", "score", "doc_id"],
                          ascending=[True, False, True])
    pdf["rn"] = pdf.groupby("grp").cumcount()
    want = pdf[pdf["rn"] < 4].sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_group_topk_ascending_and_small_groups(ray_session):
    import pyarrow as pa
    import ray

    from icat_lucene_ray.ops.sampling import group_topk

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "grp": pa.array(["a", "a", "b", "c"]),
        "score": pa.array([5.0, 1.0, 9.0, 2.0]),
    })
    got = group_topk(ray.data.from_arrow(t), "grp", "score", 1,
                     id_col="doc_id", ascending=True).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [1, 2, 3]
