"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design (ray_guide "Aggregation at scale"): content hashes / signatures
are computed vectorized in ``map_batches``; the only shuffles are
``groupby`` over hash keys (exact) or exploded (band, band_hash) rows
(LSH). Candidate verification and the final connected components run on
the (provably small) candidate set.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from icat_lucene_ray.ops.text import add_md5_fingerprint

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the lowest-id row per distinct content (hash-partitioned
    ``groupby`` over a content hash ≈ D1 upsert keep-one,
    ``Lucene.java:327-330``). Returns (fp_md5, doc_id) keepers."""
    hashed = ds.map_batches(
        lambda b: add_md5_fingerprint(b, text_col).select(["fp_md5", id_col]),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min

    return hashed.groupby("fp_md5").aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _token_shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


class MinHasher:
    """Actor-pool stage: universal-hash permutations (a·x+b mod p) built
    once per actor; emits one exploded row per (band, band_hash, doc)."""

    #: 31-bit prime so (a·x + b) stays < 2^62 — overflow-free in uint64
    P31 = np.uint64((1 << 31) - 1)

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        p = int(self.P31)
        self.a = rng.integers(1, p, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, p, num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = (_token_shingle_hashes(text or "", self.k) % self.P31)
        # vectorized universal hashing: (num_perm, n_shingles) min-reduce
        return ((self.a[:, None] * sh[None, :] + self.b[:, None])
                % self.P31).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for did, text in zip(ids, batch[self.text_col].to_pylist()):
            sig = self.signature(text)
            for bi in range(self.bands):
                band = sig[bi * self.rows:(bi + 1) * self.rows]
                h = hashlib.blake2b(band.tobytes(), digest_size=8).digest()
                out_band.append(bi)
                out_hash.append(int.from_bytes(h, "big") >> 1)
                out_id.append(did)
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            self.id_col: pa.array(out_id, pa.int64()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Emit candidate pairs from one LSH bucket (cap to bound blowup on
    degenerate buckets; log-surfaced via the pair_capped column)."""
    ids = sorted(group["doc_id"].to_pylist())
    cap = 50
    capped = len(ids) > cap
    ids = ids[:cap]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({
        "id_a": pa.array(a, pa.int64()),
        "id_b": pa.array(b, pa.int64()),
        "pair_capped": pa.array([capped] * len(a), pa.bool_()),
    })


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(_token_shingle_hashes(text_a, k).tolist())
    sb = set(_token_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """MinHash+LSH near-dup detection:
    shingle→minhash→band→``groupby(band, band_hash)``→candidate pairs→
    exact n-gram-Jaccard verify→connected components (driver union-find
    over the small verified-pair set). Returns
    ``{"pairs": [(a, b, jaccard)...], "clusters": {doc: root}, "keep": [ids]}``.
    """
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, text_col=text_col,
                                   id_col=id_col),
        batch_format="pyarrow",
        concurrency=_pool_size(),
    )
    pairs_tbl = (
        sig.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    ).to_pandas()
    if len(pairs_tbl) == 0:
        keep = sorted(ds.select_columns([id_col]).to_pandas()[id_col].tolist())
        return {"pairs": [], "clusters": {}, "keep": keep}
    cand = set(zip(pairs_tbl["id_a"], pairs_tbl["id_b"]))

    # verify candidates exactly (fetch texts of involved docs only)
    involved = sorted({d for p in cand for d in p})
    texts = _fetch_texts(ds, involved, text_col, id_col)
    verified = []
    for a, b in sorted(cand):
        j = ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        if j >= threshold:
            verified.append((int(a), int(b), j))

    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _j in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {d: find(d) for d in involved if find(d) != d or d in parent}
    drop = {d for d, r in clusters.items() if r != d}
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col].tolist()
    keep = sorted(d for d in all_ids if d not in drop)
    return {"pairs": verified, "clusters": clusters, "keep": keep}


def _fetch_texts(ds, ids, text_col, id_col) -> dict[int, str]:
    idset = set(ids)
    out: dict[int, str] = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow"):
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if d in idset:
                out[d] = t
    return out


def _pool_size() -> int:
    import ray

    return max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: 64-bit SimHash per doc + 4×16-bit band keys for
    hamming-distance bucketing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        from collections import Counter

        for t, w in Counter(toks).items():
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), np.uint8),
                bitorder="little").astype(np.int64)
            acc += w * (2 * bits - 1)
        return int(np.packbits((acc > 0).astype(np.uint8),
                               bitorder="little").view(np.uint64)[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        hs = [self.simhash64(t) for t in batch[self.text_col].to_pylist()]
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "simhash": pa.array([h & 0x7FFF_FFFF_FFFF_FFFF for h in hs],
                                pa.int64()),
        }
        for band in range(4):
            cols[f"sh_band{band}"] = pa.array(
                [(h >> (16 * band)) & 0xFFFF for h in hs], pa.int32())
        return pa.table(cols)


def simhash_dedup(ds: ray.data.Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> dict:
    """SimHash near-dup: docs sharing any 16-bit band are candidates
    (any pair within hamming ≤ 3 of 64 bits shares ≥1 of 4 bands —
    pigeonhole); verify by exact hamming distance."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=_pool_size(),
    )
    pairs: set[tuple[int, int]] = set()
    sig_of: dict[int, int] = {}
    frames = sigs.to_pandas()
    for _i, row in frames.iterrows():
        sig_of[int(row[id_col])] = int(row["simhash"])
    for band in range(4):
        for _k, grp in frames.groupby(f"sh_band{band}"):
            ids = sorted(int(x) for x in grp[id_col])[:50]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
    verified = []
    for a, b in sorted(pairs):
        d = bin(sig_of[a] ^ sig_of[b]).count("1")
        if d <= max_hamming:
            verified.append((a, b, d))
    return {"pairs": verified}


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block: int = 2048,
) -> list[tuple[int, int, float]]:
    """All pairs with cosine ≥ threshold. Streams row-blocks against an
    accumulated normalized matrix (O(n²) matmul in blocks — the exact
    small/medium-scale path; the LSH-bucketed path for huge n is
    ``similarity.random_hyperplane_buckets``)."""
    ids_all: list[np.ndarray] = []
    vecs_all: list[np.ndarray] = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=block):
        v = np.vstack([np.asarray(x, dtype=np.float64)
                       for x in b[vec_col].to_pylist()])
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        ids_all.append(b[id_col].to_numpy(zero_copy_only=False))
        vecs_all.append(v)
    out: list[tuple[int, int, float]] = []
    for i, (ia, va) in enumerate(zip(ids_all, vecs_all)):
        for j in range(i, len(ids_all)):
            ib, vb = ids_all[j], vecs_all[j]
            sim = va @ vb.T
            if i == j:
                np.fill_diagonal(sim, -1.0)
            aa, bb = np.nonzero(sim >= threshold)
            for x, y in zip(aa, bb):
                p, q = int(ia[x]), int(ib[y])
                if p < q:
                    out.append((p, q, float(sim[x, y])))
    return sorted(out)
