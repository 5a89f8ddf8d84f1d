"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Design (ray_guide "Aggregation at scale"): content hashes / signatures
are computed vectorized in ``map_batches`` (Arrow re2 splits the text;
Python hashes only the *unique* tokens per batch; everything else is
numpy), and the only shuffle is a bounded-cardinality ``groupby`` over
LSH bucket ids. Candidate verification and the final connected
components run on the (provably small) candidate set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from icat_lucene_ray.ops.text import add_md5_fingerprint

_MERSENNE61 = np.uint64((1 << 61) - 1)
_P31 = np.uint64((1 << 31) - 1)
#: polynomial base for shingle / band combining (odd, < 2^30)
_POLY_C = np.uint64(0x27d4_eb2f)


def _mod_p31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31 - 1) for x < 2^63, via Mersenne folds — no uint64
    hardware division (the division is ~20× the cost of the folds on
    the multiply-heavy MinHash path)."""
    x = (x & _P31) + (x >> np.uint64(31))
    x = (x & _P31) + (x >> np.uint64(31))
    return np.where(x >= _P31, x - _P31, x)


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
# vectorized token / shingle hashing
# ---------------------------------------------------------------------------

class _TokenHasher:
    """Per-worker memoized token→31-bit-hash table. Python's blake2b runs
    once per *unique* token per batch (Zipf text: ~10× fewer calls than
    per-occurrence); the memo carries across batches."""

    def __init__(self, cap: int = 1 << 20):
        self._memo: dict[str, int] = {}
        self._cap = cap

    def hash31(self, uniques: list[str]) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, t in enumerate(uniques):
            h = memo.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(),
                    "big")
                if len(memo) < self._cap:
                    memo[t] = h
            out[i] = h
        return out % _P31

    def hash64(self, uniques: list[str]) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, t in enumerate(uniques):
            h = memo.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(),
                    "big")
                if len(memo) < self._cap:
                    memo[t] = h
            out[i] = h
        return out


def _tokenize_flat(texts: pa.Array | pa.ChunkedArray, hasher: _TokenHasher,
                   bits: int = 31) -> tuple[np.ndarray, np.ndarray]:
    """texts -> (token_offsets int64[n+1], flat token hashes uint64)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.coalesce(texts, ""))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # drop the empty strings produced by leading/trailing/repeated spaces
    # (str.split() semantics)
    flat_all = toks.flatten()
    keep = pc.not_equal(pc.utf8_length(flat_all), 0)
    lens_all = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(np.arange(len(texts), dtype=np.int64), lens_all)
    doc_rep = doc_rep[keep_np]
    flat = flat_all.filter(keep)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc_rep, minlength=len(texts)), out=offsets[1:])

    if len(flat) == 0:
        return offsets, np.empty(0, dtype=np.uint64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uh = (hasher.hash31 if bits == 31 else hasher.hash64)(
        enc.dictionary.to_pylist())
    return offsets, uh[codes]


def _shingle_hash_batch(offsets: np.ndarray, th: np.ndarray, k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial k-token shingle hashes (31-bit space).

    Per doc with n tokens: max(1, n-k+1) shingles; docs shorter than k
    get one shingle over all their tokens; empty docs get the single
    hash 0. Returns (shingle_offsets int64[n+1], flat hashes uint64).
    Collision probability in 2^31 space is ~|shingles|²/2^32 per doc
    pair — noise-level for near-dup estimation.
    """
    n = len(offsets) - 1
    tok_lens = np.diff(offsets)
    m = np.maximum(1, tok_lens - k + 1)
    m[tok_lens == 0] = 1
    sh_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(m, out=sh_off[1:])
    M = int(sh_off[-1])
    out = np.zeros(M, dtype=np.uint64)

    # flat window-start token index per shingle; width = min(k, n_tokens)
    within = np.arange(M, dtype=np.int64) - np.repeat(sh_off[:-1], m)
    W = np.repeat(offsets[:-1], m) + within
    width = np.repeat(np.minimum(tok_lens, k), m)

    c_pow = np.empty(k + 1, dtype=np.uint64)
    c_pow[0] = 1
    for i in range(1, k + 1):
        c_pow[i] = (c_pow[i - 1] * _POLY_C) % _P31
    for i in range(k):
        sel = width > i
        if not sel.any():
            break
        idx = W[sel] + i
        coef = c_pow[(width[sel] - 1 - i).astype(np.int64)]
        out[sel] = _mod_p31(out[sel] + coef * th[idx])
    return sh_off, out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: universal-hash permutations (a·x+b mod p) built
    once per actor; emits one exploded row per (band, band_hash, doc).
    Fully vectorized: per-batch cost is k shifted multiply-adds for the
    shingles + a chunked segmented-min for the signatures."""

    P31 = _P31

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7,
                 num_buckets: int = 512):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        p = int(self.P31)
        self.a = rng.integers(1, p, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, p, num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.text_col, self.id_col = text_col, id_col
        self.num_buckets = num_buckets
        self.hasher = _TokenHasher()
        # band combine coefficients (poly over the r in-band values)
        self.band_coef = np.empty(self.rows, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(self.rows - 1, -1, -1):
            self.band_coef[i] = acc
            acc = np.uint64((int(acc) * int(_POLY_C)) % int(_P31))

    def signatures(self, texts: pa.Array | list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 MinHash signature matrix."""
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), pa.string())
        offs, th = _tokenize_flat(texts, self.hasher)
        sh_off, sh = _shingle_hash_batch(offs, th, self.k)
        n = len(sh_off) - 1
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        starts = sh_off[:-1]
        # chunk the permutations so the (chunk, M) temp stays ~64 MB
        chunk = max(1, min(self.num_perm, (8 << 20) // max(1, len(sh))))
        for c0 in range(0, self.num_perm, chunk):
            c1 = min(self.num_perm, c0 + chunk)
            hv = _mod_p31(self.a[c0:c1, None] * sh[None, :]
                          + self.b[c0:c1, None])  # (c, M)
            sig[:, c0:c1] = np.minimum.reduceat(hv, starts, axis=1).T
        return sig

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(n_docs, bands) int64 band keys (poly-combined, mod 2^61-1)."""
        r = sig.reshape(sig.shape[0], self.bands, self.rows)
        acc = np.zeros((sig.shape[0], self.bands), dtype=np.uint64)
        for i in range(self.rows):
            acc = (acc + self.band_coef[i] * r[:, :, i]) % _MERSENNE61
        return acc.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = self.signatures(batch[self.text_col])
        bh = self.band_hashes(sig)  # (n, bands)
        band_idx = np.tile(np.arange(self.bands, dtype=np.int32), n)
        flat_hash = bh.reshape(-1)
        bucket = ((flat_hash.astype(np.uint64)
                   + np.uint64(0x9e37_79b9) * band_idx.astype(np.uint64))
                  % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table({
            "band": pa.array(band_idx),
            "band_hash": pa.array(flat_hash, pa.int64()),
            "bucket": pa.array(bucket),
            self.id_col: pa.array(np.repeat(ids, self.bands), pa.int64()),
        })


def _bucket_pairs_vec(group: pa.Table, id_col: str = "doc_id",
                      cap: int = 50) -> pa.Table:
    """Vectorized candidate-pair emission for ONE LSH bucket-shard: sort
    by (band, band_hash), find equal-key runs, emit intra-run pairs
    (run size capped to bound blowup on degenerate buckets)."""
    band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    change = np.empty(len(band), dtype=bool)
    change[0] = True
    change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(change)
    lens = np.append(starts[1:], len(band)) - starts
    multi = np.flatnonzero(lens >= 2)
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    capped_any = False
    for gi in multi:
        s, L = starts[gi], min(int(lens[gi]), cap)
        capped_any = capped_any or lens[gi] > cap
        run = ids[s:s + L]
        iu, ju = np.triu_indices(L, k=1)
        a_out.append(run[iu])
        b_out.append(run[ju])
    if not a_out:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "pair_capped": pa.array([], pa.bool_())})
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({
        "id_a": pa.array(lo, pa.int64()),
        "id_b": pa.array(hi, pa.int64()),
        "pair_capped": pa.array(np.full(len(lo), capped_any), pa.bool_()),
    })


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    h = _TokenHasher()
    offs, th = _tokenize_flat(pa.array([text_a or "", text_b or ""]), h)
    sh_off, sh = _shingle_hash_batch(offs, th, k)
    sa = set(sh[sh_off[0]:sh_off[1]].tolist())
    sb = set(sh[sh_off[1]:sh_off[2]].tolist())
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
    shingle→minhash→band→``groupby(bucket)`` (bounded cardinality — the
    bucket id folds (band, band_hash), so the shuffle has ≤512 groups
    and pair emission inside each group is one vectorized lexsort, not
    one Python call per LSH key)→candidate pairs→exact n-gram-Jaccard
    verify→connected components (driver union-find over the small
    verified-pair set). Returns
    ``{"pairs": [(a, b, jaccard)...], "clusters": {doc: root}, "keep": [ids]}``.
    """
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, text_col=text_col,
                                   id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, _pool_size()),
    )
    pairs_tbl = (
        sig.groupby("bucket")
        .map_groups(lambda g: _bucket_pairs_vec(g, id_col),
                    batch_format="pyarrow")
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
    """Fetch the texts of the given ids only (vectorized is_in filter
    per batch; only matching rows reach the driver)."""
    want = pa.array(list(ids), pa.int64())
    out: dict[int, str] = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow"):
        m = pc.is_in(batch[id_col], value_set=want)
        hit = batch.filter(m)
        for d, t in zip(hit[id_col].to_pylist(), hit[text_col].to_pylist()):
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
    hamming-distance bucketing. The batch path is vectorized (token
    uniques hashed once, per-doc bit-vote via reduceat) and bit-exact
    with the scalar :meth:`simhash64` reference."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.hasher = _TokenHasher()

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

    def simhash_batch(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        offs, th = _tokenize_flat(texts, self.hasher, bits=64)
        n = len(offs) - 1
        out = np.zeros(n, dtype=np.uint64)
        if len(th) == 0:
            return out
        # ±1 bit matrix per occurrence, per-doc sum via reduceat
        b8 = th.view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(b8, axis=1, bitorder="little").astype(np.int16)
        signs = (2 * bits - 1)  # (M, 64)
        nonempty = np.flatnonzero(np.diff(offs) > 0)
        acc = np.add.reduceat(signs, offs[nonempty], axis=0)  # (#nonempty, 64)
        sh = np.packbits((acc > 0).astype(np.uint8), axis=1,
                         bitorder="little").view(np.uint64).ravel()
        out[nonempty] = sh
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = self.simhash_batch(batch[self.text_col])
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "simhash": pa.array(
                (hs & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)),
        }
        for band in range(4):
            cols[f"sh_band{band}"] = pa.array(
                ((hs >> np.uint64(16 * band)) & np.uint64(0xFFFF))
                .astype(np.int32))
        return pa.table(cols)


def simhash_dedup(ds: ray.data.Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> dict:
    """SimHash near-dup: docs sharing any 16-bit band are candidates
    (any pair within hamming ≤ 3 of 64 bits shares ≥1 of 4 bands —
    pigeonhole); verify by exact hamming distance."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, _pool_size()),
    )
    pairs: set[tuple[int, int]] = set()
    sig_of: dict[int, int] = {}
    frames = sigs.to_pandas()
    sig_of = dict(zip(frames[id_col].astype(int), frames["simhash"].astype(int)))
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
