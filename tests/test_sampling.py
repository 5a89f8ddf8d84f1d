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
