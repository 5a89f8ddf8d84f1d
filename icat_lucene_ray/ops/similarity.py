"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once, read per actor),
  per-batch partial top-k, driver k-way merge. The correctness baseline.
- :func:`ivf_topk` — IVF scale path: seeded k-means-lite centroids, a
  cluster-assignment ``map_batches`` pass, then probe only the nearest
  ``nprobe`` clusters.
- :func:`random_hyperplane_buckets` — LSH bucketing stage for
  embedding near-dup at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else len(flat)
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _TopKScorer:
    """Per-batch scorer. Used as a stateless task (elastic, no pool
    reservation — avoids pool-vs-read CPU deadlock on small clusters);
    the query matrix is broadcast via ``ray.put`` and re-read per batch,
    which is a zero-copy shared-memory lookup, not a re-ship."""

    def __init__(self, q_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q @ v.T  # (nq, nbatch)
        nq, nb = sims.shape
        k = min(self.k, nb)
        out_q, out_id, out_sim = [], [], []
        for qi in range(nq):
            s = sims[qi]
            idx = np.argpartition(-s, k - 1)[:k] if k < nb else np.arange(nb)
            out_q += [qi] * len(idx)
            out_id += ids[idx].tolist()
            out_sim += s[idx].tolist()
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            self.id_col: pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_sim, pa.float64()),
        })


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k per query row. Result: (query_id, vec_id,
    cosine) ranked cosine desc, id asc."""
    q_ref = ray.put(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    scorer = _TopKScorer(q_ref, k, vec_col, id_col)
    partials = ds.map_batches(
        scorer.__call__,
        batch_format="pyarrow",
        batch_size=4096,
    ).to_pandas()  # ≤ k·n_queries·n_blocks rows — small
    out_rows = {"query_id": [], id_col: [], "cosine": []}
    for qi, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out_rows["query_id"] += [int(qi)] * len(grp)
        out_rows[id_col] += grp[id_col].astype(int).tolist()
        out_rows["cosine"] += grp["cosine"].tolist()
    return pa.table({
        "query_id": pa.array(out_rows["query_id"], pa.int32()),
        id_col: pa.array(out_rows[id_col], pa.int64()),
        "cosine": pa.array(out_rows["cosine"], pa.float64()),
    })


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate path
# ---------------------------------------------------------------------------

def _init_sample_rows(ds: ray.data.Dataset, n: int, id_col: str,
                      vec_col: str):
    """Deterministic init sample: the ``n`` id-smallest rows, selected
    distributed (per-batch partial top-n by id, driver fold of the
    <= n-per-block partials). Unlike ``Dataset.limit`` — whose block
    SUBSET is task-completion-order dependent above ``n`` rows — the
    result is a pure function of the data, so seeded inits are
    reproducible across runs and parallelism levels. Driver traffic is
    O(n * n_blocks * dim); cap ``n`` (init_sample) accordingly."""
    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= n:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.argpartition(ids, n - 1)[:n]
        return batch.take(pa.array(np.sort(keep)))

    tbl = (ds.select_columns([id_col, vec_col])
             .map_batches(_partial, batch_format="pyarrow")
             .to_pandas())
    return (tbl.nsmallest(n, id_col, keep="first")
               .sort_values(id_col).reset_index(drop=True))


def train_centroids(ds: ray.data.Dataset, n_clusters: int = 16,
                    *, vec_col: str = "embedding", sample: int = 4096,
                    iters: int = 8, seed: int = 11,
                    id_col: str | None = None) -> np.ndarray:
    """Seeded k-means-lite on a driver-side sample (centroid training is
    a tiny fraction of the data; assignment stays distributed). With
    ``id_col`` the sample is the ``sample`` id-smallest rows chosen
    distributed (:func:`_init_sample_rows`) — fully deterministic at
    any corpus size; without it, ``Dataset.limit`` + byte sort (only
    deterministic when the dataset has <= ``sample`` rows)."""
    if id_col is not None:
        tbl = _init_sample_rows(ds, sample, id_col, vec_col)
    else:
        tbl = ds.limit(sample).select_columns([vec_col]).to_pandas()
    m = _normalize(np.vstack([np.asarray(v, dtype=np.float64)
                              for v in tbl[vec_col]]))
    if id_col is None:
        m = m[np.lexsort(m.T[::-1])]
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IVFAssign:
    def __init__(self, cent_ref, vec_col: str):
        c = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        self.cent = c
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _normalize(_batch_matrix(batch, self.vec_col))
        assign = np.argmax(v @ self.cent.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(assign))


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 1_000_000,
) -> pa.Table:
    """IVF approximate top-k: assign rows to centroids (one map_batches
    pass), then brute-force only rows in each query's ``nprobe`` nearest
    clusters. Partitioning assumption: cluster sizes are balanced-ish.

    AD HOC PATH ONLY: every call re-trains centroids and re-assigns the
    whole corpus, so the per-query cost is a full scan — above
    ``max_rows`` this raises and points at the persisted index
    (:func:`build_ivf_index` once + :func:`ivf_index_topk` per query,
    which prunes untouched cluster partitions at the read)."""
    n_rows = ds.count()
    if n_rows > max_rows:
        raise ValueError(
            f"ivf_topk re-assigns the whole corpus per call; {n_rows} rows "
            f"> max_rows={max_rows}. Build a persisted index once with "
            "build_ivf_index(ds, out_dir) and query it with "
            "ivf_index_topk(out_dir, queries) — only the nprobe probed "
            "cluster partitions are read.")
    cent = train_centroids(ds, n_clusters, vec_col=vec_col, id_col=id_col)
    assign = _IVFAssign(cent, vec_col)
    assigned = ds.map_batches(assign.__call__, batch_format="pyarrow")
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe for c in row})
    import pyarrow.compute as pc_

    sub = assigned.map_batches(
        lambda b: b.filter(pc_.is_in(b["cluster"], value_set=pa.array(
            wanted, pa.int32()))),
        batch_format="pyarrow",
    )
    return brute_force_topk(sub, q, k, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------------------
# random-hyperplane LSH buckets (near-dup scale path)
# ---------------------------------------------------------------------------

class RandomHyperplaneBucketer:
    """map_batches stage: sign-pattern bucket key from ``nbits`` seeded
    random hyperplanes; cosine-similar vectors collide with high
    probability. Shuffle key for a subsequent groupby('bucket')."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 5,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _batch_matrix(batch, self.vec_col)
        bits = (v @ self.planes.T) > 0
        keys = np.packbits(bits, axis=1, bitorder="little")
        pad = np.zeros((len(keys), 8), dtype=np.uint8)
        pad[:, :keys.shape[1]] = keys[:, :8]
        bucket = pad.view(np.int64).ravel()
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


# ---------------------------------------------------------------------------
# persisted IVF index (the production scale path)
# ---------------------------------------------------------------------------

def build_ivf_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
    train: str = "sample",
) -> dict:
    """Write a cluster-partitioned IVF index: centroids trained once
    (``train='sample'``: driver-side sample via
    :func:`train_centroids`; ``train='full'``: distributed full-data
    Lloyd via :func:`kmeans_fit` — tighter partitions on skewed
    corpora at the cost of ``iters`` streamed passes), every row
    assigned in one distributed pass, rows written as ``cluster=<c>/``
    parquet partitions so a query READS only its ``nprobe`` clusters
    (partition pruning — the persisted counterpart of
    :func:`ivf_topk`, which recomputes clusters per call and is only
    for ad-hoc use). Returns the manifest dict."""
    import json
    import os

    if train == "full":
        cent = kmeans_fit(ds, n_clusters, vec_col=vec_col,
                          id_col=id_col, seed=seed)
    else:
        cent = train_centroids(ds, n_clusters, vec_col=vec_col, seed=seed,
                               id_col=id_col)
    assign = _IVFAssign(cent, vec_col)
    (ds.select_columns([id_col, vec_col])
       .map_batches(assign.__call__, batch_format="pyarrow")
       .write_parquet(out_dir, partition_cols=["cluster"]))
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    man = {"n_clusters": int(len(cent)), "dim": int(cent.shape[1]),
           "vec_col": vec_col, "id_col": id_col}
    with open(os.path.join(out_dir, "ivf.json"), "w") as f:
        json.dump(man, f)
    return man


def ivf_index_topk(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
) -> pa.Table:
    """Query a persisted IVF index: pick each query's ``nprobe`` nearest
    centroids, read ONLY those cluster partitions, brute-force within.
    At 100 TB the read is the win — untouched clusters never leave
    storage."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf.json")) as f:
        man = json.load(f)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe for c in row})
    dirs = [os.path.join(index_dir, f"cluster={c}") for c in wanted]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int32()),
                         man["id_col"]: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    sub = ray.data.read_parquet(paths)
    return brute_force_topk(sub, q, k, vec_col=man["vec_col"],
                            id_col=man["id_col"])


# ---------------------------------------------------------------------------
# product quantization (PQ / IVF-PQ) — the compressed 100-TB ANN path
# ---------------------------------------------------------------------------

def train_pq(ds: ray.data.Dataset, *, m_sub: int = 8,
             n_centroids: int = 256, vec_col: str = "embedding",
             id_col: str = "vec_id", sample: int = 4096,
             iters: int = 12, seed: int = 13) -> dict:
    """Train product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): L2-normalize, split the
    dim into ``m_sub`` contiguous subspaces, run seeded Euclidean
    k-means per subspace on the deterministic id-smallest sample
    (:func:`_init_sample_rows` — pure function of the data). A vector
    compresses to ``m_sub`` uint8 codes (64x for dim-64 float32), so at
    100 TB the ADC scan reads ~1.5 TB of codes instead of the raw
    matrix. Returns the picklable model dict."""
    tbl = _init_sample_rows(ds, sample, id_col, vec_col)
    m = _normalize(np.vstack([np.asarray(v, dtype=np.float64)
                              for v in tbl[vec_col]]))
    n, dim = m.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    kc = min(n_centroids, n)
    if kc > 256:
        raise ValueError("n_centroids > 256 does not fit uint8 codes")
    books = np.empty((m_sub, kc, dsub), dtype=np.float64)
    for j in range(m_sub):
        sub = m[:, j * dsub:(j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cent = sub[rng.choice(n, size=kc, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kc):
                sel = sub[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books[j] = cent
    return {"codebooks": books, "dim": dim, "m_sub": m_sub,
            "dsub": dsub, "n_centroids": kc}


class _PQEncoder:
    """map_batches stage: vector -> m_sub uint8 codes (nearest subspace
    centroid each). Codebooks broadcast once via ``ray.put``; the
    ||c||^2 - 2 v.c distance trick keeps the kernel one matmul per
    subspace."""

    def __init__(self, pq_ref, vec_col: str, id_col: str):
        pq = ray.get(pq_ref) if not isinstance(pq_ref, dict) else pq_ref
        self.books = pq["codebooks"]
        self.dsub = pq["dsub"]
        self.vec_col, self.id_col = vec_col, id_col
        self.c2 = (self.books ** 2).sum(axis=2)  # (m_sub, kc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _normalize(_batch_matrix(batch, self.vec_col))
        m_sub = len(self.books)
        codes = np.empty((len(v), m_sub), dtype=np.uint8)
        for j in range(m_sub):
            sub = v[:, j * self.dsub:(j + 1) * self.dsub]
            d = self.c2[j][None, :] - 2.0 * (sub @ self.books[j].T)
            codes[:, j] = np.argmin(d, axis=1)
        return pa.table({
            self.id_col: batch[self.id_col],
            "pq_code": pa.array(list(codes), pa.list_(pa.uint8())),
        })


def pq_encode(ds: ray.data.Dataset, pq: dict, *,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """Compress a corpus to PQ codes: one stateless ``map_batches``
    pass, output ``(id_col, pq_code list<uint8>)``."""
    enc = _PQEncoder(ray.put(pq), vec_col, id_col)
    return ds.select_columns([id_col, vec_col]).map_batches(
        enc.__call__, batch_format="pyarrow")


class _ADCScorer:
    """Asymmetric distance computation over PQ codes: per query build
    the (m_sub, kc) lookup table of subspace inner products ONCE, then
    score a batch as LUT gathers + row sums — no float vectors read."""

    def __init__(self, pq_ref, q_ref, k: int, id_col: str):
        pq = ray.get(pq_ref) if not isinstance(pq_ref, dict) else pq_ref
        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        books, dsub = pq["codebooks"], pq["dsub"]
        m_sub, kc = books.shape[0], books.shape[1]
        self.lut = np.empty((len(q), m_sub, kc), dtype=np.float64)
        for j in range(m_sub):
            self.lut[:, j, :] = q[:, j * dsub:(j + 1) * dsub] \
                @ books[j].T
        self.k, self.id_col = k, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int32()),
                self.id_col: pa.array([], pa.int64()),
                "adc_score": pa.array([], pa.float64()),
            })
        arr = batch["pq_code"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes = arr.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(batch), -1).astype(np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        nq, m_sub = self.lut.shape[0], codes.shape[1]
        out_q, out_id, out_s = [], [], []
        cols = np.arange(m_sub)
        for qi in range(nq):
            s = self.lut[qi][cols[None, :], codes].sum(axis=1)
            k = min(self.k, len(s))
            idx = (np.argpartition(-s, k - 1)[:k] if k < len(s)
                   else np.arange(len(s)))
            out_q += [qi] * len(idx)
            out_id += ids[idx].tolist()
            out_s += s[idx].tolist()
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            self.id_col: pa.array(out_id, pa.int64()),
            "adc_score": pa.array(out_s, pa.float64()),
        })


def pq_topk(codes: ray.data.Dataset, pq: dict, queries: np.ndarray,
            k: int = 10, *, id_col: str = "vec_id") -> pa.Table:
    """Approximate cosine top-k over a PQ-encoded corpus (ADC): result
    ``(query_id, id, adc_score)`` ranked score desc, id asc. Same
    partial-top-k-per-batch + driver k-way merge shape as
    :func:`brute_force_topk` — driver traffic <= k * queries *
    blocks."""
    scorer = _ADCScorer(ray.put(pq), ray.put(np.atleast_2d(
        np.asarray(queries, dtype=np.float64))), k, id_col)
    partials = codes.map_batches(scorer.__call__, batch_format="pyarrow",
                                 batch_size=8192).to_pandas()
    out = {"query_id": [], id_col: [], "adc_score": []}
    for qi, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["adc_score", id_col],
                              ascending=[False, True]).head(k)
        out["query_id"] += [int(qi)] * len(grp)
        out[id_col] += grp[id_col].astype(int).tolist()
        out["adc_score"] += grp["adc_score"].tolist()
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int32()),
        id_col: pa.array(out[id_col], pa.int64()),
        "adc_score": pa.array(out["adc_score"], pa.float64()),
    })


def build_pq_index(ds: ray.data.Dataset, out_dir: str, *,
                   m_sub: int = 8, n_centroids: int = 256,
                   ivf_clusters: int = 0, vec_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 13) -> dict:
    """Persist a PQ (or IVF-PQ) index: codebooks trained once, the
    corpus encoded in one distributed pass, codes written as parquet —
    with ``ivf_clusters > 0`` rows are also assigned to coarse
    centroids and the codes land in ``cluster=<c>/`` partitions so a
    query reads only its ``nprobe`` clusters' CODES (IVF partition
    pruning x PQ compression — the standard 100-TB ANN layout)."""
    import json
    import os

    pq_model = train_pq(ds, m_sub=m_sub, n_centroids=n_centroids,
                        vec_col=vec_col, id_col=id_col, seed=seed)
    enc = _PQEncoder(ray.put(pq_model), vec_col, id_col)
    man = {"m_sub": m_sub, "dsub": pq_model["dsub"],
           "dim": pq_model["dim"],
           "n_centroids": pq_model["n_centroids"],
           "ivf_clusters": int(ivf_clusters), "id_col": id_col}
    if ivf_clusters > 0:
        cent = train_centroids(ds, ivf_clusters, vec_col=vec_col,
                               seed=seed, id_col=id_col)
        assign = _IVFAssign(cent, vec_col)

        def _enc_with_cluster(b: pa.Table) -> pa.Table:
            return enc(b).append_column(
                "cluster", assign(b)["cluster"])

        (ds.select_columns([id_col, vec_col])
           .map_batches(_enc_with_cluster, batch_format="pyarrow")
           .write_parquet(out_dir, partition_cols=["cluster"]))
        np.save(os.path.join(out_dir, "coarse_centroids.npy"), cent)
    else:
        (ds.select_columns([id_col, vec_col])
           .map_batches(enc.__call__, batch_format="pyarrow")
           .write_parquet(out_dir))
    np.save(os.path.join(out_dir, "pq_codebooks.npy"),
            pq_model["codebooks"])
    with open(os.path.join(out_dir, "pq.json"), "w") as f:
        json.dump(man, f)
    return man


def pq_index_topk(index_dir: str, queries: np.ndarray, k: int = 10, *,
                  nprobe: int = 4) -> pa.Table:
    """Query a persisted PQ / IVF-PQ index: load codebooks, prune to
    the ``nprobe`` nearest coarse clusters when the index is
    IVF-partitioned, ADC-scan only those partitions' codes."""
    import json
    import os

    with open(os.path.join(index_dir, "pq.json")) as f:
        man = json.load(f)
    books = np.load(os.path.join(index_dir, "pq_codebooks.npy"))
    pq_model = {"codebooks": books, "dim": man["dim"],
                "m_sub": man["m_sub"], "dsub": man["dsub"],
                "n_centroids": man["n_centroids"]}
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    if man["ivf_clusters"] > 0:
        cent = np.load(os.path.join(index_dir, "coarse_centroids.npy"))
        probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probe for c in row})
        dirs = [os.path.join(index_dir, f"cluster={c}") for c in wanted]
        paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not paths:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             man["id_col"]: pa.array([], pa.int64()),
                             "adc_score": pa.array([], pa.float64())})
        codes = ray.data.read_parquet(paths)
    else:
        paths = [os.path.join(index_dir, f)
                 for f in sorted(os.listdir(index_dir))
                 if f.endswith(".parquet")]
        codes = ray.data.read_parquet(paths)
    return pq_topk(codes, pq_model, q, k, id_col=man["id_col"])


# ---------------------------------------------------------------------------
# distributed spherical k-means (full-data Lloyd's)
# ---------------------------------------------------------------------------

def _kmeans_partials(batch: pa.Table, cent_ref, vec_col: str,
                     id_col: str) -> pa.Table:
    """One Lloyd E+partial-M step over one batch: assign rows to their
    nearest centroid (cosine), emit k partial rows (cluster, count,
    vector sum) — the classic combiner that makes k-means a
    map-side-reduced pass: driver traffic is O(k * dim * n_batches),
    never O(rows)."""
    cent = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) \
        else cent_ref
    m = _normalize(_batch_matrix(batch, vec_col))
    assign = np.argmax(m @ cent.T, axis=1)
    k, dim = cent.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, m)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    pid = int(ids.min()) if len(ids) else 0
    return pa.table({
        "pid": pa.array([pid] * k, pa.int64()),
        "cluster": pa.array(np.arange(k, dtype=np.int32)),
        "count": pa.array(counts),
        "vsum": pa.array(list(sums), pa.list_(pa.float64())),
    })


def kmeans_fit(ds: ray.data.Dataset, k: int = 8, *,
               vec_col: str = "embedding", id_col: str = "vec_id",
               iters: int = 10, seed: int = 11,
               init_sample: int = 4096) -> np.ndarray:
    """Full-data distributed spherical k-means (Lloyd's): unlike
    :func:`train_centroids` (sample-only, good enough for IVF routing)
    every iteration streams the WHOLE dataset through one
    ``map_batches`` pass emitting k partial (count, sum) rows per
    batch; the driver folds partials in pid order (deterministic float
    association — same input → bit-identical centroids regardless of
    task completion order) and renormalizes. Init is the seeded choice
    from the ``init_sample`` id-smallest rows selected distributed
    (:func:`_init_sample_rows`) — a pure function of the data, so the
    init is reproducible at any corpus size (``Dataset.limit``'s block
    subset is task-completion-order dependent above the sample size).

    Scale: per-iteration driver traffic O(k * dim * n_batches); no
    shuffle, no row materialization. 10 iters over 100 TB = 10 streamed
    passes — cache the dataset upstream if re-reads are the bottleneck.
    """
    tbl = _init_sample_rows(ds, init_sample, id_col, vec_col)
    m0 = _normalize(np.vstack([np.asarray(v, dtype=np.float64)
                               for v in tbl[vec_col]]))
    rng = np.random.default_rng(seed)
    cent = m0[rng.choice(len(m0), size=min(k, len(m0)), replace=False)]
    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = ds.map_batches(
            _kmeans_partials, batch_format="pyarrow",
            fn_args=(cent_ref, vec_col, id_col)).to_pandas()
        parts = parts.sort_values(["pid", "cluster"], kind="stable")
        kk, dim = cent.shape
        clusters = parts["cluster"].to_numpy().astype(np.int64)
        sums = np.zeros((kk, dim), dtype=np.float64)
        # np.add.at accumulates in row order (pid-sorted) — deterministic
        np.add.at(sums, clusters,
                  np.vstack(parts["vsum"].to_numpy()).astype(np.float64))
        counts = np.bincount(clusters, weights=parts["count"].to_numpy(),
                             minlength=kk).astype(np.int64)
        nz = counts > 0
        new = cent.copy()
        new[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new)
    return cent


def kmeans_assign(ds: ray.data.Dataset, centroids: np.ndarray, *,
                  vec_col: str = "embedding") -> ray.data.Dataset:
    """Streaming cluster assignment: appends an int32 ``cluster``
    column (nearest centroid by cosine). One stateless map_batches
    pass; centroids broadcast once."""
    return ds.map_batches(_IVFAssign(centroids, vec_col).__call__,
                          batch_format="pyarrow")


def kmeans_cluster(ds: ray.data.Dataset, k: int = 8, *,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   iters: int = 10, seed: int = 11
                   ) -> tuple[ray.data.Dataset, np.ndarray]:
    """Fit + assign: returns (dataset with ``cluster`` column,
    centroids). The curation primitive behind semantic bucketing /
    domain mixing / cluster-balanced sampling."""
    cent = kmeans_fit(ds, k, vec_col=vec_col, id_col=id_col,
                      iters=iters, seed=seed)
    return kmeans_assign(ds, cent, vec_col=vec_col), cent
