"""Product quantization (ops/similarity.py train_pq/pq_encode/pq_topk
and the persisted IVF-PQ index) — recall vs exact brute force,
determinism, partition-pruning equivalence, and validation."""

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.ops.similarity import (
    brute_force_topk, build_pq_index, pq_encode, pq_index_topk,
    pq_topk, train_pq,
)


def _emb_ds(n=400, dim=32, seed=7, n_blocks=4):
    import ray.data

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    # plant a tight cluster around vector 0 so top-k has signal
    base[1:9] = base[0] + 0.05 * rng.standard_normal((8, dim))
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in base],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(n_blocks), base


def test_pq_recall_vs_brute_force(ray_session):
    ds, base = _emb_ds()
    pq = train_pq(ds, m_sub=8, n_centroids=64)
    codes = pq_encode(ds, pq)
    q = base[0]
    approx = pq_topk(codes, pq, q, k=10)
    exact = brute_force_topk(ds, q, k=10)
    got = set(approx["vec_id"].to_pylist())
    want = set(exact["vec_id"].to_pylist())
    # planted near-dups dominate: PQ at 64 centroids must recover most
    assert len(got & want) >= 7, (sorted(got), sorted(want))


def test_pq_codes_deterministic(ray_session):
    ds, _ = _emb_ds()
    pq1 = train_pq(ds, m_sub=4, n_centroids=32)
    pq2 = train_pq(ds, m_sub=4, n_centroids=32)
    np.testing.assert_array_equal(pq1["codebooks"], pq2["codebooks"])
    c1 = pq_encode(ds, pq1).to_pandas().sort_values("vec_id")
    c2 = pq_encode(ds, pq2).to_pandas().sort_values("vec_id")
    assert [list(x) for x in c1["pq_code"]] == \
           [list(x) for x in c2["pq_code"]]


def test_pq_index_partition_pruning_equivalence(ray_session, tmp_path):
    """IVF-PQ with nprobe == n_clusters scans every partition, so it
    must equal the flat PQ scan exactly (same codebooks, same ADC)."""
    ds, base = _emb_ds()
    flat_dir = str(tmp_path / "pq_flat")
    ivf_dir = str(tmp_path / "pq_ivf")
    build_pq_index(ds, flat_dir, m_sub=8, n_centroids=64)
    build_pq_index(ds, ivf_dir, m_sub=8, n_centroids=64,
                   ivf_clusters=4)
    q = base[0]
    a = pq_index_topk(flat_dir, q, k=10).to_pandas()
    b = pq_index_topk(ivf_dir, q, k=10, nprobe=4).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_allclose(a["adc_score"], b["adc_score"],
                               rtol=1e-12)
    # pruned probe reads fewer partitions but must still find the
    # planted cluster (all near-dups share the query's cell)
    c = pq_index_topk(ivf_dir, q, k=10, nprobe=1)
    assert 0 in c["vec_id"].to_pylist()


def test_pq_validation(ray_session):
    ds, _ = _emb_ds(dim=30)  # 30 % 8 != 0
    with pytest.raises(ValueError):
        train_pq(ds, m_sub=8)
    ds2, _ = _emb_ds()
    with pytest.raises(ValueError):
        train_pq(ds2, m_sub=4, n_centroids=300)
