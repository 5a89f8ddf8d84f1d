"""Distributed full-data spherical k-means vs a serial numpy oracle
(training-data op family — no reference parity; the scale form of
`ops/similarity.py train_centroids`)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from icat_lucene_ray.ops.similarity import (
    _normalize, kmeans_assign, kmeans_cluster, kmeans_fit)

DIM, N_PER, SEED = 8, 100, 7


def _blob_table() -> tuple[pa.Table, np.ndarray]:
    """3 well-separated unit-vector blobs with small noise."""
    rng = np.random.default_rng(SEED)
    centers = _normalize(rng.normal(size=(3, DIM)))
    # force separation: orthogonalize via QR
    q, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    centers = q[:3]
    rows, labels = [], []
    for c in range(3):
        pts = centers[c] + 0.05 * rng.normal(size=(N_PER, DIM))
        rows.append(pts)
        labels += [c] * N_PER
    m = np.vstack(rows)
    order = rng.permutation(len(m))
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([list(v) for v in m[order]],
                              pa.list_(pa.float64())),
        "label": pa.array(np.asarray(labels)[order], pa.int32()),
    })
    return t, m[order]


def _serial_kmeans(m: np.ndarray, k: int, iters: int, seed: int,
                   init_sample: int) -> np.ndarray:
    """The same algorithm, single process: seeded init from the first
    init_sample rows, full-data Lloyd with mean + renormalize."""
    m = _normalize(m.astype(np.float64))
    m0 = m[:init_sample]
    rng = np.random.default_rng(seed)
    cent = m0[rng.choice(len(m0), size=min(k, len(m0)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            sel = m[assign == c]
            if len(sel):
                new[c] = sel.mean(axis=0)
        cent = _normalize(new)
    return cent


@pytest.fixture(scope="module")
def blobs(ray_session):
    t, m = _blob_table()
    return ray.data.from_arrow(t), t, m


def test_matches_serial_oracle(blobs):
    ds, t, m = blobs
    cent = kmeans_fit(ds, k=3, iters=6, seed=3, init_sample=256)
    ref = _serial_kmeans(m, k=3, iters=6, seed=3, init_sample=256)
    # distributed fold changes float association only; well-separated
    # blobs keep assignments identical and centroids tight
    assert np.allclose(np.sort(cent, axis=0), np.sort(ref, axis=0),
                       atol=1e-9)
    a_ray = np.argmax(_normalize(m) @ cent.T, axis=1)
    a_ref = np.argmax(_normalize(m) @ ref.T, axis=1)
    assert (a_ray == a_ref).all()


def test_deterministic_across_runs(blobs):
    ds, _, _ = blobs
    c1 = kmeans_fit(ds, k=3, iters=4, seed=5, init_sample=256)
    c2 = kmeans_fit(ds, k=3, iters=4, seed=5, init_sample=256)
    assert np.array_equal(c1, c2)


def test_cluster_purity(blobs):
    ds, t, _ = blobs
    assigned, cent = kmeans_cluster(ds, k=3, iters=6, seed=3)
    df = assigned.to_pandas()
    assert cent.shape == (3, DIM)
    # each true blob lands in exactly one distinct cluster
    mapping = {}
    for lab, grp in df.groupby("label"):
        top = grp["cluster"].value_counts()
        assert top.iloc[0] == len(grp), f"blob {lab} split"
        mapping[lab] = top.index[0]
    assert len(set(mapping.values())) == 3


def test_assign_streams(blobs):
    ds, t, m = blobs
    cent = kmeans_fit(ds, k=3, iters=3, seed=3)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    want = np.argmax(_normalize(m) @ cent.T, axis=1)
    got = out.sort_values("vec_id")["cluster"].to_numpy()
    ids = out.sort_values("vec_id")["vec_id"].to_numpy()
    assert (got == want[ids]).all()


def test_empty_cluster_kept(ray_session):
    """k > natural clusters: empty clusters keep their previous
    centroid (no NaNs), counts stay consistent."""
    rng = np.random.default_rng(0)
    m = _normalize(np.vstack([np.ones((50, 4)),
                              rng.normal(size=(2, 4)) * 0 + 1]))
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([list(v) for v in m], pa.list_(pa.float64())),
    })
    cent = kmeans_fit(ray.data.from_arrow(t), k=4, iters=3, seed=1)
    assert np.isfinite(cent).all()


def test_ivf_full_train(blobs, tmp_path):
    """build_ivf_index(train='full') partitions by kmeans_fit centroids;
    on well-separated blobs the probe-1 read returns the true top-k."""
    import os

    from icat_lucene_ray.ops.similarity import (
        _normalize as _nrm, build_ivf_index, ivf_index_topk)

    ds, t, m = blobs
    out = str(tmp_path / "ivf_full")
    man = build_ivf_index(ds, out, n_clusters=3, train="full", seed=3)
    assert man["n_clusters"] == 3
    assert sorted(d for d in os.listdir(out) if d.startswith("cluster=")) \
        == ["cluster=0", "cluster=1", "cluster=2"]
    q = m[7]
    got = ivf_index_topk(out, q, k=5, nprobe=1)
    sims = _nrm(m) @ _nrm(np.atleast_2d(q))[0]
    want = set(np.argsort(-sims)[:5].tolist())
    # vec_id i corresponds to m[i] (m is already in table order), so
    # brute-force indices ARE vec_ids
    assert set(got["vec_id"].to_pylist()) == want
