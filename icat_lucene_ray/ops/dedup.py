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

def keep_min_per_fp(g: pa.Table, id_col: str,
                    drop_cols: tuple[str, ...] = ("_dbkt",)) -> pa.Table:
    """One hash BUCKET of content groups: sort by (fp_md5, id), keep the
    first row of each fp run — vectorized, one Python call per bucket
    (NOT per content group; at web scale almost every group has size 1,
    so per-group map_groups would mean O(rows) Python calls)."""
    order = pc.sort_indices(
        pa.table({"f": g["fp_md5"], "i": g[id_col]}),
        sort_keys=[("f", "ascending"), ("i", "ascending")])
    g = g.take(order)
    keys = g["fp_md5"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        first[1:] = keys[1:] != keys[:-1]
    return g.filter(pa.array(first)).drop_columns(list(drop_cols))


def drop_non_min_per_fp(g: pa.Table, id_col: str,
                        out_col: str) -> pa.Table:
    """One hash BUCKET of (fp, id) pairs: emit ``out_col`` for every
    row that is NOT the lowest-``id_col`` of its fp run — the
    complement of :func:`keep_min_per_fp`, for the pair-shuffle exact
    dedup path where the corpus payload stays OUT of the exchange and
    the small drop set anti-filters the corpus in a streaming second
    pass. Assumes ``id_col`` values are unique per row (true for url /
    doc_id keys), since the anti-filter keys on the id."""
    order = pc.sort_indices(
        pa.table({"f": g["fp_md5"], "i": g[id_col]}),
        sort_keys=[("f", "ascending"), ("i", "ascending")])
    g = g.take(order)
    keys = g["fp_md5"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        first[1:] = keys[1:] != keys[:-1]
    return g.filter(pa.array(~first)).select([out_col])


def add_fp_bucket(b: pa.Table, num_buckets: int,
                  out: str = "_dbkt") -> pa.Table:
    """Coarse shuffle key from the md5 hex prefix: ``int(fp[:8], 16) %
    num_buckets``. Bucket COUNT (not content-hash cardinality ~ n rows)
    is the groupby key space, so the exchange stays coarse at any
    corpus size."""
    fps = b["fp_md5"].to_pylist()
    bkt = np.fromiter((int(f[:8], 16) % num_buckets for f in fps),
                      dtype=np.int64, count=len(fps))
    return b.append_column(out, pa.array(bkt))


def exact_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id",
                num_buckets: int = 256) -> ray.data.Dataset:
    """Keep the lowest-id row per distinct content (≈ D1 upsert
    keep-one, ``Lucene.java:327-330``). Returns (fp_md5, doc_id)
    keepers.

    BUCKETED shuffle (same form as the curate pipeline's dedup stage):
    rows group by ``hash(fp_md5) % num_buckets`` — a bounded key space —
    and each group call keeps the lowest id per fp run vectorized. A
    ``groupby(fp_md5)`` would key the exchange on ~n distinct hashes;
    the combiner keeps it from hanging, but the coarse bucket key is
    strictly cheaper and one partitioning rule shared across the
    engine's dedup paths."""
    hashed = ds.map_batches(
        lambda b: add_fp_bucket(
            add_md5_fingerprint(b, text_col).select(["fp_md5", id_col]),
            num_buckets),
        batch_format="pyarrow",
    )
    return hashed.groupby("_dbkt").map_groups(
        keep_min_per_fp, batch_format="pyarrow", fn_args=(id_col,))


# ---------------------------------------------------------------------------
# vectorized token / shingle hashing
# ---------------------------------------------------------------------------

def _md5_64(token: bytes) -> int:
    """First 8 md5 bytes, little-endian — chosen because it is
    recomputable OUTSIDE the engine: DuckDB's ``md5_number_upper(t)``
    returns exactly this value, so every signature derived from it
    (simhash, shingle hashes) has an independent SQL oracle."""
    return int.from_bytes(hashlib.md5(token).digest()[:8], "little")


class _TokenHasher:
    """Per-worker memoized token→64-bit-hash table. Python's md5 runs
    once per *unique* token per batch (Zipf text: ~10× fewer calls than
    per-occurrence); the memo carries across batches."""

    def __init__(self, cap: int = 1 << 20):
        self._memo: dict[str, int] = {}
        self._cap = cap

    def hash31(self, uniques: list[str]) -> np.ndarray:
        return self.hash64(uniques) % _P31

    def hash64(self, uniques: list[str]) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, t in enumerate(uniques):
            h = memo.get(t)
            if h is None:
                h = _md5_64(t.encode())
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

#: sentinel for a never-filled OPH bin (no shingle value can be 2^64-1
#: because the value remix adds 1 after a wrapping odd multiply)
_OPH_EMPTY = np.uint64(0xFFFF_FFFF_FFFF_FFFF)


class MinHasher:
    """Actor-pool stage: universal-hash permutations (a·x+b mod p) built
    once per actor; emits one exploded row per (band-folded key, doc).
    Fully vectorized: per-batch cost is k shifted multiply-adds for the
    shingles + a chunked segmented-min for the signatures.

    ``scheme`` selects the signature kernel:

    - ``"perm"`` (default): classic ``num_perm`` independent universal
      hashes, O(shingles x num_perm) multiply-adds per doc. Lowest
      variance at every document length — the right choice when docs
      can be short (the sf ``documents`` table averages ~54 tokens).
    - ``"oph"``: one-permutation hashing with rotation densification
      (Li, Owen, Zhang, NIPS 2012; Shrivastava, ICML 2017): each
      shingle is hashed ONCE and scatter-min'd into
      ``hash -> bin`` buckets, O(shingles) per doc — measured 17x
      faster than ``"perm"`` and the difference dominates the 100-TB
      near-dup bill (at 12M pages the perm kernel is 1059 s of the
      1698 s LSH stage). Estimator accuracy matches perm for docs
      >= ~50 tokens and degrades below (rmse 0.16 vs 0.03 at 8
      tokens) because empty bins are densified from correlated
      neighbors — so it is OPT-IN, for long-form corpora (web pages
      average ~220 tokens). The scheme must be uniform across a
      corpus: signatures from different schemes are not comparable.
      Measured at 12M real-length pages the short tail's densified
      signatures inflated LSH candidates 13 -> 2.1M (all rejected by
      the exact verify, but the verify bill swallowed the kernel win)
      — hence:
    - ``"auto"``: length-stratified banding. J >= t bounds a
      qualifying pair's shingle-count ratio to [t, 1/t] (set sizes),
      so docs route by shingle count: < ``auto_hi`` get perm-keyed
      rows, >= ``auto_lo`` get oph-keyed rows, and the overlap window
      [auto_lo, auto_hi) is double-signed so a pair straddling the
      pivot always shares a scheme — NO qualifying pair is lost.
      Perm cost concentrates in long docs (cost ∝ shingles x
      num_perm), which auto sends to oph, so auto keeps ~the full oph
      speedup while short docs keep the low-variance perm estimator.
      Defaults assume threshold >= ``auto_ratio`` (0.7); for lower
      thresholds widen the window via ``auto_ratio``.
    """

    P31 = _P31

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7,
                 num_buckets: int = 512, scheme: str = "perm",
                 auto_pivot: int = 48, auto_ratio: float = 0.7):
        assert num_perm % bands == 0
        if scheme not in ("perm", "oph", "auto"):
            raise ValueError(f"unknown MinHash scheme {scheme!r} "
                             "(expected 'perm', 'oph' or 'auto')")
        self.scheme = scheme
        # auto stratification window (shingle counts): docs below
        # auto_pivot/auto_ratio get perm rows, docs at or above
        # auto_pivot*auto_ratio get oph rows — the overlap double-signs
        # so a straddling pair always shares a scheme (see class doc)
        self.auto_lo = max(1, int(np.ceil(auto_pivot * auto_ratio)))
        self.auto_hi = int(np.ceil(auto_pivot / auto_ratio))
        self.auto_ratio = auto_ratio
        # fixed hashed donor-probe table for optimal densification:
        # bin i probes _oph_probes[i, 0], [i, 1], ... — a pure function
        # of the bin index so all docs share the alignment
        cell = np.arange(num_perm * 64, dtype=np.uint64).reshape(
            num_perm, 64)
        self._oph_probes = ((cell * np.uint64(0x9E37_79B9_7F4A_7C15)
                             >> np.uint64(29))
                            % np.uint64(num_perm)).astype(np.int64)
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
        self._scratch: np.ndarray | None = None  # reused (chunk, M) buffers
        self._tmp: np.ndarray | None = None
        # band combine coefficients (poly over the r in-band values)
        self.band_coef = np.empty(self.rows, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(self.rows - 1, -1, -1):
            self.band_coef[i] = acc
            acc = np.uint64((int(acc) * int(_POLY_C)) % int(_P31))

    def signatures(self, texts: pa.Array | list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 MinHash signature matrix.

        The permutation pass writes into per-actor REUSED scratch
        (out= kernels, in-place Mersenne folds): the naive expression
        allocates ~1 GB of fresh temporaries per 4096-doc batch, and on
        hosts with serialized page-fault service (BASELINE.md caveat)
        first-touch faults — not arithmetic — dominated the signature
        stage. Output is bit-identical to the expression form."""
        if self.scheme == "auto":
            raise ValueError(
                "scheme='auto' stratifies docs by length at the banding "
                "level (MinHasher.__call__); per-doc signature matrices "
                "are not comparable across strata — construct a "
                "MinHasher with scheme='perm' or 'oph' instead")
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), pa.string())
        offs, th = _tokenize_flat(texts, self.hasher)
        sh_off, sh = _shingle_hash_batch(offs, th, self.k)
        n = len(sh_off) - 1
        if self.scheme == "oph":
            return self._signatures_oph(sh_off, sh, n)
        return self._signatures_perm(sh_off, sh, n)

    def _signatures_perm(self, sh_off: np.ndarray, sh: np.ndarray,
                         n: int) -> np.ndarray:
        starts = sh_off[:-1]
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        M = len(sh)
        # chunk the permutations so the (chunk, M) scratch stays ~64 MB
        chunk = max(1, min(self.num_perm, (8 << 20) // max(1, M)))
        need = chunk * max(1, M)
        if self._scratch is None or len(self._scratch) < need:
            self._scratch = np.empty(need, dtype=np.uint64)
            self._tmp = np.empty(need, dtype=np.uint64)
        for c0 in range(0, self.num_perm, chunk):
            c1 = min(self.num_perm, c0 + chunk)
            c = c1 - c0
            hv = self._scratch[:c * M].reshape(c, M)
            tmp = self._tmp[:c * M].reshape(c, M)
            np.multiply(self.a[c0:c1, None], sh[None, :], out=hv)
            np.add(hv, self.b[c0:c1, None], out=hv)
            # x mod (2^31-1) via two in-place Mersenne folds + subtract
            for _ in range(2):
                np.right_shift(hv, np.uint64(31), out=tmp)
                np.bitwise_and(hv, _P31, out=hv)
                np.add(hv, tmp, out=hv)
            np.subtract(hv, _P31, out=hv, where=hv >= _P31)
            sig[:, c0:c1] = np.minimum.reduceat(hv, starts, axis=1).T
        return sig

    def _signatures_oph(self, sh_off: np.ndarray, sh: np.ndarray,
                        n: int) -> np.ndarray:
        """One-permutation signatures: one wrapping 64-bit mix per
        shingle assigns a bin (high bits) and a value (a second remix),
        then a scatter-min fills the (n, num_perm) matrix.

        Empty bins use OPTIMAL DENSIFICATION (Shrivastava, ICML 2017):
        bin i probes a fixed hashed sequence of donor bins H[i, a] and
        copies the first ORGANIC (scatter-filled) value it finds. Two
        properties matter for LSH quality:

        - donors are organic-only. An earlier rotation variant chained
          already-densified values; a chain replicates one shared
          minimum across whole bands, letting a band collide with
          probability ~J instead of ~J^r — measured as a 13 -> 2.1M
          candidate-pair explosion at 12M pages. With organic-only
          donors, a densified bin matches iff its donor bin's organic
          minima match (~J), restoring near-independent band bins.
        - the probe sequence is a function of the bin index only, so
          two docs densify bin i from the same donor bin whenever both
          have it organic — alignment the estimator needs.

        Docs with zero shingles keep the _OPH_EMPTY sentinel in every
        bin (two empty docs estimate J=1, matching the convention of
        the exact verify). Deterministic: no RNG, no seed."""
        P = self.num_perm
        mixed = sh * np.uint64(0x9E37_79B9_7F4A_7C15)
        bins = ((mixed >> np.uint64(32)) % np.uint64(P)).astype(np.int64)
        vals = mixed * np.uint64(0xBF58_476D_1CE4_E5B9) + np.uint64(1)
        sig = np.full(n * P, _OPH_EMPTY, dtype=np.uint64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(sh_off).astype(np.int64))
        np.minimum.at(sig, doc_idx * P + bins, vals)
        sig = sig.reshape(n, P)
        organic = sig != _OPH_EMPTY
        has_org = organic.any(axis=1)
        # flat worklist of (doc, bin) cells to densify — work is
        # proportional to the number of empty bins and shrinks
        # geometrically per probe (each probe hits an organic donor
        # with probability = the doc's organic fill fraction)
        doc_e, bin_e = np.nonzero(~organic & has_org[:, None])
        for a in range(self._oph_probes.shape[1]):
            if not len(doc_e):
                break
            donor = self._oph_probes[bin_e, a]
            hit = organic[doc_e, donor]
            if hit.any():
                sig[doc_e[hit], bin_e[hit]] = sig[doc_e[hit], donor[hit]]
            doc_e, bin_e = doc_e[~hit], bin_e[~hit]
        # deterministic sweep for cells whose probes all missed (only
        # realistic for docs with very few organic bins): nearest
        # organic bin by rotation — still organic-only donors
        for d in range(1, P):
            if not len(doc_e):
                break
            donor = (bin_e + d) % P
            hit = organic[doc_e, donor]
            if hit.any():
                sig[doc_e[hit], bin_e[hit]] = sig[doc_e[hit], donor[hit]]
            doc_e, bin_e = doc_e[~hit], bin_e[~hit]
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

    def _folded_keys(self, sig: np.ndarray, scheme_tag: int) -> np.ndarray:
        """(n,) x bands flat folded collision keys for a signature
        matrix. The band index is folded into the 61-bit band hash with
        a wrapping 64-bit golden-ratio mix: ONE collision key instead
        of the (band, band_hash) column pair, so the exploded shuffle
        row is 20 B not 24 B and in-group run detection sorts one key.
        A cross-(band, hash) key collision (~2^-61 per pair) only adds
        a candidate pair, which the exact-Jaccard verify rejects — it
        can never drop a true candidate. ``scheme_tag`` keeps perm and
        oph keys from ever forming a run together under scheme='auto'
        (the two estimators' values are incomparable)."""
        n = sig.shape[0]
        bh = self.band_hashes(sig)
        band_idx = np.tile(np.arange(self.bands, dtype=np.uint64), n)
        key = (bh.reshape(-1).view(np.uint64)
               + band_idx * np.uint64(0x9e37_79b9_7f4a_7c15))
        if scheme_tag:
            key = key * np.uint64(2) + np.uint64(scheme_tag)
        return key

    def _exploded(self, key: np.ndarray, ids: np.ndarray) -> pa.Table:
        bucket = (key % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table({
            "key": pa.array(key.view(np.int64), pa.int64()),
            "bucket": pa.array(bucket),
            self.id_col: pa.array(np.repeat(ids, self.bands), pa.int64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if self.scheme != "auto":
            sig = self.signatures(batch[self.text_col])
            return self._exploded(self._folded_keys(sig, 0), ids)
        # auto: length-stratified kernels. J >= auto_ratio bounds the
        # shingle-count ratio of a qualifying pair to
        # [auto_ratio, 1/auto_ratio], so routing docs by shingle count
        # with a double-signed overlap window [auto_lo, auto_hi) loses
        # NO qualifying pair: both short -> both perm rows; both long
        # -> both oph rows; straddling -> both endpoints fall in the
        # window and share both schemes.
        texts = batch[self.text_col]
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), pa.string())
        offs, th = _tokenize_flat(texts, self.hasher)
        sh_off, sh = _shingle_hash_batch(offs, th, self.k)
        counts = np.diff(sh_off)
        parts = []
        for mask, kernel, tag in (
                (counts < self.auto_hi, self._signatures_perm, 0),
                (counts >= self.auto_lo, self._signatures_oph, 1)):
            sel = np.flatnonzero(mask)
            if not len(sel):
                continue
            lens = counts[sel]
            sub_off = np.zeros(len(sel) + 1, dtype=sh_off.dtype)
            np.cumsum(lens, out=sub_off[1:])
            total = int(sub_off[-1])
            idx = (np.repeat(sh_off[:-1][sel] - sub_off[:-1], lens)
                   + np.arange(total, dtype=np.int64))
            sig = kernel(sub_off, sh[idx], len(sel))
            parts.append(self._exploded(
                self._folded_keys(sig, tag), ids[sel]))
        if not parts:
            return self._exploded(
                np.zeros(0, dtype=np.uint64), ids[:0])
        return pa.concat_tables(parts)


def _bucket_pairs_vec(group: pa.Table, id_col: str = "doc_id",
                      cap: int = 50) -> pa.Table:
    """Vectorized candidate-pair emission for ONE LSH bucket-shard: sort
    by the folded (band, band_hash) collision key, find equal-key runs,
    emit intra-run pairs (run size capped to bound blowup on degenerate
    buckets)."""
    key = group["key"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, key))
    key, ids = key[order], ids[order]
    change = np.empty(len(key), dtype=bool)
    change[0] = True
    change[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(change)
    lens = np.append(starts[1:], len(key)) - starts
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
    neq = lo != hi  # a folded-key collision between two bands of the
    lo, hi = lo[neq], hi[neq]  # same doc must not emit a self-pair
    return pa.table({
        "id_a": pa.array(lo, pa.int64()),
        "id_b": pa.array(hi, pa.int64()),
        "pair_capped": pa.array(np.full(len(lo), capped_any), pa.bool_()),
    })


class _ShingleSketcher:
    """Actor-pool stage: per-doc bottom-``sketch_k`` UNIQUE shingle-hash
    sketch (sorted uint64 list). For docs whose unique-shingle count is
    < ``sketch_k`` the sketch IS the exact shingle set, so downstream
    Jaccard is exact (identical to :func:`ngram_jaccard`); above it the
    bottom-k sketch gives the standard unbiased estimate."""

    def __init__(self, shingle_k: int = 5, sketch_k: int = 8192,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_buckets: int = 256):
        self.k, self.sketch_k = shingle_k, sketch_k
        self.text_col, self.id_col = text_col, id_col
        self.nb = num_buckets
        self.hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        offs, th = _tokenize_flat(batch[self.text_col], self.hasher)
        sh_off, sh = _shingle_hash_batch(offs, th, self.k)
        values: list[np.ndarray] = []
        offsets = np.zeros(len(ids) + 1, dtype=np.int64)
        for i in range(len(ids)):
            u = np.unique(sh[sh_off[i]:sh_off[i + 1]])[:self.sketch_k]
            values.append(u)
            offsets[i + 1] = offsets[i] + len(u)
        flat = np.concatenate(values) if values else np.empty(0, np.uint64)
        sketch = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64()))
        n = len(ids)
        return pa.table({
            "gb": pa.array((ids.astype(np.uint64) * _HASH_MULT
                            % np.uint64(self.nb)).astype(np.int64)),
            "nid": pa.array(ids, pa.int64()),
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "sketch": sketch,
        })


def _sketch_jaccard(sa: np.ndarray, sb: np.ndarray, k: int) -> float:
    """Jaccard of two sorted-unique bottom-k shingle sketches. Exact when
    both sets are complete (< k elements); bottom-k estimate otherwise."""
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    if len(sa) < k and len(sb) < k:
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        return inter / (len(sa) + len(sb) - inter)
    union = np.union1d(sa, sb)[:k]
    inter = np.intersect1d(sa, sb, assume_unique=True)
    hits = np.intersect1d(union, inter, assume_unique=True).size
    return hits / max(1, min(k, len(union)))


def _dedup_pairs_np(a: np.ndarray, b: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (a, b) rows via lexsort run-finding (64-bit-safe — no
    packing into one word, ids may exceed 2^32 at corpus scale)."""
    if a.size == 0:
        return a.astype(np.int64), b.astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep].astype(np.int64), b[keep].astype(np.int64)


#: golden-ratio multiplier for the pair-bucket hash (uint64 wraparound)
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def _pairs_to_side_rows(batch: pa.Table, nb: int) -> pa.Table:
    """(id_a, id_b) candidate rows -> two tagged rows per pair, schema-
    aligned with the sketch rows for the union-groupby join. ``gb`` is
    the endpoint's shuffle bucket (same formula as the sketch rows)."""
    a = batch["id_a"].to_numpy(zero_copy_only=False)
    b = batch["id_b"].to_numpy(zero_copy_only=False)
    nid = np.concatenate([a, b]).astype(np.int64)
    n = len(nid)
    return pa.table({
        "gb": pa.array((nid.astype(np.uint64) * _HASH_MULT
                        % np.uint64(nb)).astype(np.int64)),
        "nid": pa.array(nid, pa.int64()),
        "id_a": pa.array(np.concatenate([a, a]), pa.int64()),
        "id_b": pa.array(np.concatenate([b, b]), pa.int64()),
        "sketch": pa.nulls(n, pa.list_(pa.uint64())),
    })


_ATTACH_EMPTY = {
    "id_a": pa.array([], pa.int64()),
    "id_b": pa.array([], pa.int64()),
    "nid": pa.array([], pa.int64()),
    "sketch": pa.array([], pa.list_(pa.uint64())),
}


def _make_attach_bucket(nb: int):
    """One HASH BUCKET of nids (not one nid — per-group Python overhead
    on tiny groups dominates at any scale): vectorized sketch lookup
    via searchsorted over the bucket's sorted sketch rows. Emits
    (id_a, id_b, nid, sketch) per DISTINCT (pair, endpoint) — duplicate
    candidates from different bands collapse here — plus ``gb2``, the
    PAIR-keyed bucket for the verify shuffle."""

    def _attach(g: pa.Table) -> pa.Table:
        is_sketch = pc.is_null(g["id_a"])
        sk_rows = g.filter(is_sketch)
        pr = g.filter(pc.invert(is_sketch))
        if sk_rows.num_rows == 0 or pr.num_rows == 0:
            return pa.table({**_ATTACH_EMPTY,
                             "gb2": pa.array([], pa.int64())})
        # distinct (nid, id_a, id_b) side rows
        nid = pr["nid"].to_numpy(zero_copy_only=False)
        pa_ = pr["id_a"].to_numpy(zero_copy_only=False)
        pb_ = pr["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pb_, pa_, nid))
        nid, pa_, pb_ = nid[order], pa_[order], pb_[order]
        keep = np.empty(len(nid), dtype=bool)
        keep[0] = True
        keep[1:] = ((nid[1:] != nid[:-1]) | (pa_[1:] != pa_[:-1])
                    | (pb_[1:] != pb_[:-1]))
        nid, pa_, pb_ = nid[keep], pa_[keep], pb_[keep]
        # sketch lookup: bucket's sketch nids are unique -> searchsorted
        sk_nid = sk_rows["nid"].to_numpy(zero_copy_only=False)
        sk_ord = np.argsort(sk_nid)
        sk_sorted = sk_nid[sk_ord]
        pos = np.searchsorted(sk_sorted, nid)
        pos = np.minimum(pos, len(sk_sorted) - 1)
        found = sk_sorted[pos] == nid
        nid, pa_, pb_, pos = nid[found], pa_[found], pb_[found], pos[found]
        sk = sk_rows["sketch"]
        if isinstance(sk, pa.ChunkedArray):
            sk = sk.combine_chunks()
        sketch = sk.take(pa.array(sk_ord[pos]))
        gb2 = ((pa_.astype(np.uint64) * _HASH_MULT
                + pb_.astype(np.uint64)) * _HASH_MULT
               % np.uint64(nb)).astype(np.int64)
        return pa.table({
            "id_a": pa.array(pa_, pa.int64()),
            "id_b": pa.array(pb_, pa.int64()),
            "nid": pa.array(nid, pa.int64()),
            "sketch": sketch,
            "gb2": pa.array(gb2),
        })

    return _attach


def _make_pair_verifier(threshold: float, sketch_k: int):
    """One PAIR-HASH BUCKET: rows (id_a, id_b, nid, sketch), ≤2 rows per
    pair (one per endpoint that had a sketch). Jaccard per complete
    pair; numpy per pair on bucket-local slices — no per-pair Arrow
    tables, no driver."""

    def _verify(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        nid = g["nid"].to_numpy(zero_copy_only=False)
        sk = g["sketch"]
        if isinstance(sk, pa.ChunkedArray):
            sk = sk.combine_chunks()
        vals = sk.values.to_numpy(zero_copy_only=False)
        offs = sk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((nid, b, a))
        a, b, nid = a[order], b[order], nid[order]
        # complete pairs = adjacent rows with same (a, b), nid a then b
        same = np.zeros(len(a), dtype=bool)
        if len(a) > 1:
            same[:-1] = (a[:-1] == a[1:]) & (b[:-1] == b[1:])
        first = np.flatnonzero(same)
        oa, ob, oj = [], [], []
        for i in first:
            ra, rb = int(order[i]), int(order[i + 1])
            sa = vals[offs[ra]:offs[ra + 1]]
            sb = vals[offs[rb]:offs[rb + 1]]
            j = _sketch_jaccard(sa, sb, sketch_k)
            if j >= threshold:
                oa.append(int(a[i]))
                ob.append(int(b[i]))
                oj.append(j)
        if not oa:
            return empty
        return pa.table({"id_a": pa.array(oa, pa.int64()),
                         "id_b": pa.array(ob, pa.int64()),
                         "jaccard": pa.array(oj, pa.float64())})
    return _verify


def verify_pairs_distributed(
    ds: ray.data.Dataset,
    cand_pairs_ds: ray.data.Dataset,
    *,
    threshold: float,
    shingle_k: int = 5,
    sketch_k: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
    endpoint_broadcast_cap: int = 4_000_000,
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard verification of candidate pairs, entirely
    cluster-side (no driver loop, no corpus broadcast): a reduce-side
    join. The corpus is first RESTRICTED to candidate-pair endpoints —
    only docs that appear in some pair ever need a sketch, and pair
    endpoints are O(pairs) while the corpus is O(N), so this turns the
    sketch pass + its shuffle from O(corpus) into O(pairs). (Without
    it, the full-corpus sketch stream piles into the union→groupby
    all-to-all's input queue and the streaming executor throttles the
    sketch producers to a single task — observed live at the 12M-page
    rehearsal: 32 CPUs idling behind one sketcher.) Endpoint ids are
    broadcast via ``ray.put`` below ``endpoint_broadcast_cap`` ids and
    applied as a vectorized ``is_in``; above it the restriction is a
    bucketed :func:`semi_join_ids_ds` (no driver state).

    One streaming pass then computes per-endpoint shingle sketches; a
    tag-union + ``groupby(gb)`` (nid HASH BUCKET) attaches each
    endpoint's sketch to its pairs; ``groupby(gb2)`` (pair hash bucket)
    computes the Jaccard and keeps survivors. Bucketed keys, not raw
    nid/pair keys: each group call processes thousands of nids/pairs
    vectorized instead of paying per-group Python/Arrow overhead on
    1-3-row groups. Shuffle volume is O(endpoint sketches + candidate
    pairs). Size ``num_buckets`` ~ (expected pairs / 10^4) so a
    bucket's pairs fit one worker; buckets cap reduce fan-in, not
    correctness."""
    cand_pairs_ds = cand_pairs_ds.materialize()
    n_pairs = cand_pairs_ds.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    ds = ds.select_columns([id_col, text_col])
    if 2 * n_pairs <= endpoint_broadcast_cap:
        # empty map_groups blocks may carry a degenerate schema — skip
        ends = np.unique(np.concatenate(
            [t[c].to_numpy(zero_copy_only=False)
             for t in ray.get(cand_pairs_ds.to_arrow_refs())
             if t.num_rows for c in ("id_a", "id_b")]))
        ref = ray.put(pa.array(ends, pa.int64()))
        ds = ds.map_batches(
            _isin_batch,
            fn_kwargs=dict(want_ref=ref, cols=[id_col, text_col],
                           id_col=id_col),
            batch_format="pyarrow")
    else:
        def _ends_batch(b: pa.Table) -> pa.Table:
            vals = np.unique(np.concatenate(
                [b["id_a"].to_numpy(zero_copy_only=False),
                 b["id_b"].to_numpy(zero_copy_only=False)])) \
                if b.num_rows else np.empty(0, np.int64)
            return pa.table({id_col: pa.array(vals, pa.int64())})

        ends_ds = cand_pairs_ds.map_batches(_ends_batch,
                                            batch_format="pyarrow")
        ds = semi_join_ids_ds(ds, ends_ds, id_col=id_col)
    sketches = ds.map_batches(
        _ShingleSketcher,
        fn_constructor_kwargs=dict(shingle_k=shingle_k, sketch_k=sketch_k,
                                   text_col=text_col, id_col=id_col,
                                   num_buckets=num_buckets),
        batch_format="pyarrow",
        concurrency=(1, _pool_size()),
    )
    sides = cand_pairs_ds.map_batches(
        lambda b: _pairs_to_side_rows(b, num_buckets),
        batch_format="pyarrow")
    attached = (
        sketches.union(sides)
        .groupby("gb")
        .map_groups(_make_attach_bucket(num_buckets),
                    batch_format="pyarrow")
    )
    return attached.groupby("gb2").map_groups(
        _make_pair_verifier(threshold, sketch_k),
        batch_format="pyarrow").select_columns(["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# distributed connected components (min-label propagation)
# ---------------------------------------------------------------------------

def _edges_to_adj(batch: pa.Table) -> pa.Table:
    """(id_a, id_b) edges -> symmetric (node, nbr) adjacency rows plus
    self-loops (a self-loop makes each node re-receive its own label
    every round, so labels are monotone non-increasing)."""
    a = batch["id_a"].to_numpy(zero_copy_only=False)
    b = batch["id_b"].to_numpy(zero_copy_only=False)
    node = np.concatenate([a, b, a])
    nbr = np.concatenate([b, a, a])
    # local dedup only (global dupes are harmless under min-aggregation)
    node, nbr = _dedup_pairs_np(node, nbr)
    return pa.table({
        "node": pa.array(node, pa.int64()),
        "nbr": pa.array(nbr, pa.int64()),
    })


def _propagate_bucket(g: pa.Table) -> pa.Table:
    """One node-hash BUCKET of the tagged union (label rows have null
    nbr; adjacency rows carry null label). A node's label row and its
    adjacency rows hash to the same bucket, so one vectorized
    searchsorted join per bucket sends every node's current label to
    all its neighbours — one Python call per bucket, never per node
    (dup-heavy web corpora have O(docs) nodes)."""
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "cand": pa.array([], pa.int64())})
    is_lab = pc.is_null(g["nbr"]).to_numpy(zero_copy_only=False)
    nodes = g["node"].to_numpy(zero_copy_only=False)
    lab_nodes = nodes[is_lab]
    if not len(lab_nodes) or is_lab.all():
        return empty
    lab_vals = g["label"].filter(pa.array(is_lab)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(lab_nodes, kind="stable")
    ln, lv = lab_nodes[order], lab_vals[order]
    adj_nodes = nodes[~is_lab]
    adj_nbrs = g["nbr"].filter(pa.array(~is_lab)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(ln, adj_nodes)
    valid = (pos < len(ln)) & (ln[np.minimum(pos, len(ln) - 1)]
                               == adj_nodes)
    return pa.table({
        "node": pa.array(adj_nbrs[valid], pa.int64()),
        "cand": pa.array(lv[pos[valid]], pa.int64()),
    })


def connected_components_labels(
    pairs_ds: ray.data.Dataset, *, max_rounds: int = 50,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed connected components over an (id_a, id_b) edge
    Dataset: iterative min-label propagation — each round every node
    broadcasts its label to its neighbours and takes the min of what it
    receives (``groupby(node).min``). Converges to the component-minimum
    label in ≤ diameter rounds; near-dup clusters are star-like, so a
    handful of rounds in practice. Driver state per round is ONE scalar
    (the label sum used as the monotone convergence witness) — never the
    pair set."""
    from ray.data.aggregate import Min

    def _with_bucket(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = ((n * 2654435761) & 0x7FFFFFFF) % num_buckets
        return b.append_column("_cbkt", pa.array(bkt.astype(np.int64)))

    adj = pairs_ds.map_batches(
        _edges_to_adj, batch_format="pyarrow").materialize()
    labels = adj.groupby("node").aggregate(
        Min("nbr", alias_name="label")).materialize()
    n_nodes = labels.count()
    if n_nodes == 0:
        return labels
    adj_tagged = adj.map_batches(
        lambda b: _with_bucket(b.append_column(
            "label", pa.nulls(b.num_rows, pa.int64()))),
        batch_format="pyarrow")
    prev_sum = None
    for _ in range(max_rounds):
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
        lab_tagged = labels.map_batches(
            lambda b: _with_bucket(pa.table({
                "node": b["node"],
                "nbr": pa.nulls(b.num_rows, pa.int64()),
                "label": b["label"],
            })),
            batch_format="pyarrow")
        msgs = (
            adj_tagged.union(lab_tagged)
            .groupby("_cbkt")
            .map_groups(_propagate_bucket, batch_format="pyarrow")
        )
        labels = msgs.groupby("node").aggregate(
            Min("cand", alias_name="label")).materialize()
    return labels


def _driver_union_find(pairs: list[tuple]) -> dict[int, int]:
    """Small-scale CC: union-find with larger→smaller parenting, so the
    final root of every node is the component MINIMUM (same labels as
    :func:`connected_components_labels`)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, *_ in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    involved = {int(d) for p in pairs for d in p[:2]}
    return {d: find(d) for d in involved}


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    h = _TokenHasher()
    offs, th = _tokenize_flat(pa.array([text_a or "", text_b or ""]), h)
    sh_off, sh = _shingle_hash_batch(offs, th, k)
    sa = set(sh[sh_off[0]:sh_off[1]].tolist())
    sb = set(sh[sh_off[1]:sh_off[2]].tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard dedup (blocked all-pairs)
# ---------------------------------------------------------------------------

def _ngram_shingle_strings(texts, k: int) -> tuple[np.ndarray, pa.Array]:
    """Per-doc k-token shingle STRINGS (tokens regex-split on ``\\s+``,
    empties dropped, windows joined with US \\x1f): docs with ≤ k tokens
    get ONE shingle over all their tokens (empty doc → the empty
    string), matching the SQL-oracle formulation exactly. Built
    vectorized: one Arrow ``take`` gather + one ``binary_join``.
    Returns (shingle_offsets int64[n+1], flat shingle string array)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.coalesce(texts, ""), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat_all = toks.flatten()
    keep = pc.not_equal(pc.utf8_length(flat_all), 0)
    lens_all = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(np.arange(len(texts), dtype=np.int64), lens_all)
    doc_rep = doc_rep[keep_np]
    flat = flat_all.filter(keep)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc_rep, minlength=len(texts)), out=offsets[1:])

    n = len(texts)
    tok_lens = np.diff(offsets)
    m = np.maximum(1, tok_lens - k + 1)
    m[tok_lens == 0] = 1
    sh_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(m, out=sh_off[1:])
    M = int(sh_off[-1])
    # flat window-start token index per shingle; width = min(k, n_tokens)
    within = np.arange(M, dtype=np.int64) - np.repeat(sh_off[:-1], m)
    W = np.repeat(offsets[:-1], m) + within
    width = np.repeat(np.minimum(tok_lens, k), m)
    total = int(width.sum())
    joff = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(width, out=joff[1:])
    gather = np.arange(total, dtype=np.int64) - np.repeat(joff[:-1], width) \
        + np.repeat(W, width)
    values = flat.take(pa.array(gather)) if total else \
        pa.array([], pa.string())
    la = pa.ListArray.from_arrays(pa.array(joff, pa.int32()), values)
    return sh_off, pc.binary_join(la, "\x1f")


def _ngram_group_pairs(g: pa.Table, *, threshold: float, k: int,
                       id_col: str, text_col: str) -> pa.Table:
    """All-pairs exact Jaccard within ONE block: distinct shingle sets
    per doc (dictionary-encoded — string-exact, no hashing), pair
    intersection counts accumulated per shared shingle (vectorized
    triangle expansion per code run), then |A∩B| / |A∪B| ≥ threshold."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    n = g.num_rows
    if n < 2:
        return empty
    order = pc.sort_indices(g[id_col])
    g = g.take(order)
    ids = g[id_col].to_numpy(zero_copy_only=False)
    sh_off, sh = _ngram_shingle_strings(g[text_col], k)
    enc = sh.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(sh_off))
    # distinct (doc, code)
    dc = np.unique(doc * (int(codes.max()) + 1) + codes)
    doc_u = dc // (int(codes.max()) + 1)
    code_u = dc % (int(codes.max()) + 1)
    set_sizes = np.bincount(doc_u, minlength=n)
    # pair co-occurrence: docs sharing a shingle, triangle per code run
    order2 = np.argsort(code_u, kind="stable")
    cs, ds_ = code_u[order2], doc_u[order2]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    run_lens = np.diff(np.r_[starts, len(cs)])
    inter = np.zeros((n, n), dtype=np.int32)
    for s, ln in zip(starts[run_lens > 1], run_lens[run_lens > 1]):
        members = ds_[s:s + ln]
        ii, jj = np.triu_indices(ln, 1)
        np.add.at(inter, (members[ii], members[jj]), 1)
    ia, ja = np.nonzero(inter)
    if not len(ia):
        return empty
    iv = inter[ia, ja].astype(np.float64)
    union = set_sizes[ia] + set_sizes[ja] - iv
    jac = iv / union
    keep = jac >= threshold
    return pa.table({
        "id_a": pa.array(ids[ia[keep]], pa.int64()),
        "id_b": pa.array(ids[ja[keep]], pa.int64()),
        "jaccard": pa.array(jac[keep], pa.float64()),
    })


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    k: int = 5,
    block_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """EXACT n-gram (k-token shingle) Jaccard near-dup pairs, blocked:
    all pairs within each ``block_cols`` group are compared with exact
    set Jaccard over literal shingle strings — no sketching, no hash
    approximation — so the result is SQL-oracle-expressible and serves
    as the ground truth the MinHash estimator is tested against.

    Scale contract (unlike :func:`minhash_lsh_dedup`, which is the
    unblocked scale path): cost is O(Σ block²) comparisons via shared-
    shingle expansion, so ``block_cols`` must bound block sizes (e.g.
    language × length-bucket × source). Near-dups in DIFFERENT blocks
    are not found — that is the documented trade for exactness.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.
    ``block_cols=()`` compares the WHOLE corpus as one block — only for
    corpora known to fit a worker."""
    if block_cols:
        blocked = ds.select_columns([id_col, text_col, *block_cols])
        keys = list(block_cols)
    else:
        blocked = ds.select_columns([id_col, text_col]).map_batches(
            lambda b: b.append_column(
                "_blk", pa.array(np.zeros(b.num_rows, np.int8))),
            batch_format="pyarrow")
        keys = ["_blk"]
    return blocked.groupby(keys).map_groups(
        lambda g: _ngram_group_pairs(
            g, threshold=threshold, k=k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    k: int = 5,
    block_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
    cc: str = "auto",
    cc_driver_cap: int = 200_000,
) -> dict:
    """Keep/drop form of :func:`ngram_jaccard_pairs` — same result
    dict as :func:`minhash_lsh_dedup` (pairs, clusters, drop,
    keep_ds)."""
    verified_ds = ngram_jaccard_pairs(
        ds, threshold=threshold, k=k, block_cols=block_cols,
        text_col=text_col, id_col=id_col).materialize()
    return _finish_dedup(ds, verified_ds, score_col="jaccard",
                         id_col=id_col, cc=cc, cc_driver_cap=cc_driver_cap)


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    target_bucket_rows: int = 65536,
    sketch_k: int = 8192,
    cc: str = "auto",
    cc_driver_cap: int = 200_000,
    scheme: str = "perm",
) -> dict:
    """MinHash+LSH near-dup detection:
    shingle→minhash→band→``groupby(bucket)``→candidate pairs→exact
    n-gram-Jaccard verify (cluster-side reduce-join,
    :func:`verify_pairs_distributed`)→connected components.

    Scale invariants (what must stay true at 100 TB):

    - the shuffle key is a coarse bucket whose COUNT grows with the
      corpus (``ceil(rows·bands / target_bucket_rows)``), so each
      ``map_groups`` group holds ~``target_bucket_rows`` exploded rows
      regardless of N; pair emission inside a group is one vectorized
      lexsort over the folded (band, band_hash) collision key;
    - pair verification never touches the driver: candidate pairs stay
      a Dataset, sketches are joined to them via union+groupby, and
      only VERIFIED pairs exist downstream;
    - connected components: ``cc='auto'`` uses driver union-find only
      below the documented ``cc_driver_cap`` verified-pair budget and
      switches to distributed min-label propagation
      (:func:`connected_components_labels`) above it; ``cc='distributed'``
      forces the cluster path (driver then holds O(nodes) drop ids and
      ONE convergence scalar per round — never the pair set, which can
      be quadratic in cluster size);
    - the full corpus is never materialized: the result carries a lazy
      ``drop_ds`` Dataset and a lazy ``keep_ds`` Dataset; the ``drop``
      *list* is materialized on the driver only below ``cc_driver_cap``
      (web-scale dup rates make it billions of ids — it must never be
      required for the keep path, which is a distributed anti-join).

    ``scheme`` selects the signature kernel (see :class:`MinHasher`):
    ``"perm"`` (default, safe at any doc length), ``"oph"``
    (one-permutation, ~17x faster, long-form corpora only), or
    ``"auto"`` (length-stratified: oph speed on long docs, perm
    estimator on short docs, double-signed boundary window so no
    qualifying pair is missed — the recommended scale path). The
    verify stage is exact and scheme-independent, so the scheme
    affects candidate RECALL only, never pair precision.

    Returns ``{"pairs": [(a, b, jaccard)...] | None, "pairs_ds": Dataset,
    "clusters": {doc: root} | None, "labels_ds": Dataset | None,
    "drop": [ids] | None, "drop_ds": Dataset[id_col], "n_drop": int,
    "keep_ds": Dataset[id_col], "cc_mode": str}``
    ("pairs"/"clusters"/"drop" are materialized only when small).
    """
    _require_int_ids(ds, id_col)
    if scheme not in ("perm", "oph", "auto"):  # fail on the driver,
        raise ValueError(f"unknown MinHash scheme {scheme!r} "  # not
                         "(expected 'perm', 'oph' or 'auto')")  # actor
    if scheme == "auto" and threshold < 0.7:
        raise ValueError(
            "scheme='auto' assumes threshold >= 0.7 (its stratification "
            "window is sized for that length-ratio bound); use "
            "scheme='perm' or construct MinHasher with a wider "
            "auto_ratio for lower thresholds")
    if num_buckets is None:
        n_rows = ds.count()  # parquet metadata count — no scan
        num_buckets = max(64, -(-n_rows * bands // target_bucket_rows))
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, text_col=text_col,
                                   id_col=id_col, num_buckets=num_buckets,
                                   scheme=scheme),
        batch_format="pyarrow",
        concurrency=(1, _pool_size()),
    )
    cand_ds = (
        sig.groupby("bucket")
        .map_groups(lambda g: _bucket_pairs_vec(g, id_col),
                    batch_format="pyarrow")
    ).select_columns(["id_a", "id_b"])
    verified_ds = verify_pairs_distributed(
        ds, cand_ds, threshold=threshold, shingle_k=shingle_k,
        sketch_k=sketch_k, text_col=text_col, id_col=id_col,
        # same adaptive sizing as the LSH buckets: expected pairs grow
        # with rows x bands, so verify fan-in stays worker-sized
        num_buckets=num_buckets,
    ).materialize()
    return _finish_dedup(ds, verified_ds, score_col="jaccard",
                         id_col=id_col, cc=cc, cc_driver_cap=cc_driver_cap)


def _finish_dedup(ds: ray.data.Dataset, verified_ds: ray.data.Dataset, *,
                  score_col: str, id_col: str, cc: str,
                  cc_driver_cap: int) -> dict:
    """Shared tail of the near-dup ops: connected components over the
    verified-pair Dataset + keep/drop construction. ``cc`` ∈ {'auto',
    'driver', 'distributed'} (see :func:`minhash_lsh_dedup`).

    The keep path NEVER routes the drop set through the driver: on the
    distributed-CC path ``keep_ds`` is a bucketed anti-join of the
    corpus ids against the (still-distributed) drop-id Dataset — at
    web-typical 30-50% dup rates the drop set is O(corpus), far past
    any driver/broadcast budget. The convenience ``drop`` list is
    materialized only when its count ≤ ``cc_driver_cap``."""
    n_pairs = verified_ds.count()
    empty_ids = ray.data.from_arrow(
        pa.table({id_col: pa.array([], pa.int64())}))
    if n_pairs == 0:
        return {"pairs": [], "pairs_ds": verified_ds, "clusters": {},
                "labels_ds": None, "drop": [], "drop_ds": empty_ids,
                "n_drop": 0, "keep_ds": ds.select_columns([id_col]),
                "cc_mode": "driver"}
    use_driver = cc == "driver" or (cc == "auto" and n_pairs <= cc_driver_cap)
    if use_driver:
        tbl = verified_ds.to_pandas()
        verified = sorted(
            (int(a), int(b), s) for a, b, s in
            zip(tbl["id_a"], tbl["id_b"], tbl[score_col]))
        clusters = _driver_union_find(verified)
        drop = sorted(d for d, r in clusters.items() if r != d)
        drop_ds = ray.data.from_arrow(
            pa.table({id_col: pa.array(drop, pa.int64())})) \
            if drop else empty_ids
        keep_ds = filter_out_ids(ds.select_columns([id_col]), drop, id_col)
        return {"pairs": verified, "pairs_ds": verified_ds,
                "clusters": clusters, "labels_ds": None, "drop": drop,
                "drop_ds": drop_ds, "n_drop": len(drop),
                "keep_ds": keep_ds, "cc_mode": "driver"}
    labels_ds = connected_components_labels(verified_ds)
    drop_ds = labels_ds.map_batches(
        lambda b: b.filter(pc.not_equal(b["node"], b["label"]))
        .select(["node"]).rename_columns([id_col]),
        batch_format="pyarrow").materialize()  # O(dropped nodes), not pairs
    n_drop = drop_ds.count()
    # distributed anti-join: the drop ids never transit the driver;
    # bucket count sized from the LARGER side so corpus >> drop set
    # can't pile ~corpus/64 rows into one worker's group
    keep_ds = anti_join_ids_ds(ds.select_columns([id_col]), drop_ds,
                               id_col=id_col, left_rows=ds.count())
    drop = sorted(int(r[id_col]) for r in drop_ds.take_all()) \
        if n_drop <= cc_driver_cap else None
    return {"pairs": None, "pairs_ds": verified_ds, "clusters": None,
            "labels_ds": labels_ds, "drop": drop, "drop_ds": drop_ds,
            "n_drop": n_drop, "keep_ds": keep_ds,
            "cc_mode": "distributed"}


def _isin_batch(batch: pa.Table, *, want_ref, cols, id_col, invert=False):
    """map_batches fn: keep (or drop) rows whose id is in the broadcast
    set. ``want_ref`` is a ``ray.put`` ObjectRef — resolved zero-copy
    per task, never re-shipped per batch."""
    import ray as _ray

    want = _ray.get(want_ref) if isinstance(want_ref, _ray.ObjectRef) \
        else want_ref
    m = pc.is_in(batch[id_col], value_set=want)
    if invert:
        m = pc.invert(m)
    return batch.select(cols).filter(m)


def anti_join_ids_ds(ds: ray.data.Dataset, drop_ds: ray.data.Dataset, *,
                     id_col: str = "doc_id",
                     num_buckets: int | None = None,
                     target_drop_rows: int = 262_144,
                     left_rows: int | None = None) -> ray.data.Dataset:
    """Distributed anti-join: rows of ``ds`` survive unless their
    ``id_col`` appears in ``drop_ds`` (one int64 ``id_col`` column).

    Contrast :func:`filter_out_ids`, which broadcasts a DRIVER-side
    list — fine for thousands of ids, fatal at web-scale dup rates
    (billions of ids = tens of GB on the driver and in every broadcast
    copy). Here the drop side stays a Dataset end-to-end: both sides
    are tagged, unioned, hash-bucketed on the id, and each bucket group
    applies one vectorized ``is_in`` (same reduce-side shape as
    :func:`icat_lucene_ray.ops.relations.hash_join`). Shuffle volume is
    O(left rows + drop ids); driver state is O(1).

    Partitioning assumption: one bucket's left rows fit a worker —
    ``num_buckets`` defaults from max(drop-side count, ``left_rows``)
    so a small drop set against a huge corpus still buckets the LEFT
    side finely enough (pass ``left_rows`` when the caller knows it;
    :func:`_finish_dedup` does)."""
    n_drop = drop_ds.count()
    if n_drop == 0:
        return ds
    if num_buckets is None:
        sizing_rows = max(n_drop, left_rows or 0)
        num_buckets = max(64, -(-sizing_rows // target_drop_rows) * 64)
    l_schema = ds.schema().base_schema
    cols = l_schema.names
    if id_col not in cols:
        raise ValueError(f"{id_col!r} not in left columns {cols}")
    fields = [pa.field(c, l_schema.field(c).type) for c in cols]
    fields += [pa.field("__side", pa.int8())]
    schema = pa.schema(fields)

    def _tag(b: pa.Table, is_left: bool) -> pa.Table:
        n = b.num_rows
        out = {}
        for c in cols:
            out[c] = b[c] if (is_left or c == id_col) else pa.nulls(n)
        out["__side"] = pa.array(
            np.zeros(n, np.int8) if is_left else np.ones(n, np.int8))
        t = pa.table(out).cast(schema)
        k = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = ((k * 2654435761) & 0x7FFFFFFF) % num_buckets
        return t.append_column("_abkt", pa.array(bkt.astype(np.int64)))

    tagged = ds.map_batches(lambda b: _tag(b, True),
                            batch_format="pyarrow") \
        .union(drop_ds.map_batches(lambda b: _tag(b, False),
                                   batch_format="pyarrow"))

    def _anti_group(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        bad = g.filter(pa.array(side == 1))[id_col]
        if isinstance(bad, pa.ChunkedArray):
            bad = bad.combine_chunks()
        keep = pc.invert(pc.is_in(left[id_col], value_set=bad))
        return left.filter(keep).drop_columns(["__side", "_abkt"])

    return tagged.groupby("_abkt").map_groups(_anti_group,
                                              batch_format="pyarrow")


def semi_join_ids_ds(ds: ray.data.Dataset, keep_ds: ray.data.Dataset, *,
                     id_col: str = "doc_id",
                     num_buckets: int | None = None,
                     left_rows: int | None = None) -> ray.data.Dataset:
    """Distributed semi-join: rows of ``ds`` survive only when their
    ``id_col`` appears in ``keep_ds`` (one int64 ``id_col`` column) —
    the complement of :func:`anti_join_ids_ds`, same tagged-union +
    hash-bucket + vectorized ``is_in`` reduce shape, same partitioning
    assumption (one bucket's left rows fit a worker). Used to restrict
    a corpus to the rows a later stage actually needs (e.g. candidate-
    pair endpoints before sketch verification) without broadcasting the
    id set or shuffling the corpus payload more than once."""
    n_keep = keep_ds.count()
    if n_keep == 0:
        return ray.data.from_arrow(ds.schema().base_schema.empty_table())
    if num_buckets is None:
        sizing_rows = max(n_keep, left_rows or 0)
        num_buckets = max(64, -(-sizing_rows // 262_144) * 64)
    l_schema = ds.schema().base_schema
    cols = l_schema.names
    if id_col not in cols:
        raise ValueError(f"{id_col!r} not in left columns {cols}")
    fields = [pa.field(c, l_schema.field(c).type) for c in cols]
    fields += [pa.field("__side", pa.int8())]
    schema = pa.schema(fields)

    def _tag(b: pa.Table, is_left: bool) -> pa.Table:
        n = b.num_rows
        out = {}
        for c in cols:
            out[c] = b[c] if (is_left or c == id_col) else pa.nulls(n)
        out["__side"] = pa.array(
            np.zeros(n, np.int8) if is_left else np.ones(n, np.int8))
        t = pa.table(out).cast(schema)
        k = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = ((k * 2654435761) & 0x7FFFFFFF) % num_buckets
        return t.append_column("_abkt", pa.array(bkt.astype(np.int64)))

    tagged = ds.map_batches(lambda b: _tag(b, True),
                            batch_format="pyarrow") \
        .union(keep_ds.map_batches(lambda b: _tag(b, False),
                                   batch_format="pyarrow"))

    def _semi_group(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        want = g.filter(pa.array(side == 1))[id_col]
        if isinstance(want, pa.ChunkedArray):
            want = want.combine_chunks()
        keep = pc.is_in(left[id_col], value_set=want)
        return left.filter(keep).drop_columns(["__side", "_abkt"])

    return tagged.groupby("_abkt").map_groups(_semi_group,
                                              batch_format="pyarrow")


def filter_out_ids(ds: ray.data.Dataset, drop_ids, id_col: str = "doc_id"
                   ) -> ray.data.Dataset:
    """Lazy cluster-side anti-filter: broadcast the (small) drop set via
    ``ray.put`` and drop matching rows in ``map_batches``. For drop sets
    past driver/broadcast budget use :func:`anti_join_ids_ds`."""
    import ray as _ray

    if not len(drop_ids):
        return ds
    ref = _ray.put(pa.array(list(drop_ids), pa.int64()))
    cols = ds.schema().names
    return ds.map_batches(
        _isin_batch,
        fn_kwargs=dict(want_ref=ref, cols=cols, id_col=id_col, invert=True),
        batch_format="pyarrow",
    )


def _require_int_ids(ds: ray.data.Dataset, id_col: str) -> None:
    """The near-dup machinery keys its shuffles/CC on int64 ids; a
    string key column would die deep in a signature batch with a
    cryptic cast error. Fail at the API with the fix."""
    t = ds.schema().base_schema.field(id_col).type
    if not pa.types.is_integer(t):
        raise TypeError(
            f"id column {id_col!r} must be integer (got {t}); hash "
            "string keys to stable int64 first (index.docids."
            "hash_ids_from_strings — pipelines.curate.dedup_transform "
            "does this automatically)")


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
        # byte value -> its 8 bits as int64 columns, little-endian: the
        # matmul table for the byte-plane histogram vote (below)
        self._lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                                  axis=1, bitorder="little") \
            .astype(np.int64)
        self._key = np.empty(0, np.int64)  # per-actor scratch, grown

    @staticmethod
    def simhash64(text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        from collections import Counter

        for t, w in Counter(toks).items():
            h = _md5_64(t.encode())
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), np.uint8),
                bitorder="little").astype(np.int64)
            acc += w * (2 * bits - 1)
        return int(np.packbits((acc > 0).astype(np.uint8),
                               bitorder="little").view(np.uint64)[0])

    def simhash_batch(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        offs, th = _tokenize_flat(texts, self.hasher, bits=64)
        n = len(offs) - 1
        if len(th) == 0:
            return np.zeros(n, dtype=np.uint64)
        # Byte-plane histogram vote. With k = doc's token count and
        # s_b = per-bit sum of raw bits, sum(2*bit - 1) > 0 ⟺ 2*s > k,
        # and each of the hash's 8 BYTE planes contributes 8 bits:
        # s[:, 8j:8j+8] = (per-doc histogram of byte j) @ LUT. The
        # histogram is one np.bincount over the fused (doc << 8 | byte)
        # key per plane — so per-token memory traffic is ~24 B (key
        # write + bincount read/increment) instead of the 128 B the
        # former (M, 64) unpacked bit plane + reduceat moved. On this
        # host's bandwidth-limited memory system that traffic collapse
        # is what restores actor-pool scaling: 8 raw procs measured
        # 64.5k docs/s (vs 21.5k for the bit-plane form, which fell to
        # 8.8k at 24 procs). Bit-identical to the scalar simhash64
        # reference.
        M = len(th)
        lens = np.diff(offs)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        if len(self._key) < M:
            self._key = np.empty(M + M // 4, np.int64)
        base = self._key[:M]
        np.left_shift(doc_rep, 8, out=base)
        b8 = th.view(np.uint8).reshape(-1, 8)
        s = np.empty((n, 64), dtype=np.int64)
        for j in range(8):
            counts = np.bincount(base + b8[:, j], minlength=n * 256)
            s[:, 8 * j:8 * j + 8] = counts.reshape(n, 256) @ self._lut
        cnt = lens[:, None]
        # empty docs need no masking: with len 0 every 2*s > 0 vote is
        # already false, so their signature packs to 0
        return np.packbits((2 * s > cnt).astype(np.uint8), axis=1,
                           bitorder="little").view(np.uint64).ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = self.simhash_batch(batch[self.text_col])
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            # full 64 bits, two's-complement reinterpretation (no mask —
            # bit 63 participates in hamming distance)
            "simhash": pa.array(hs.view(np.int64)),
        }
        for band in range(4):
            cols[f"sh_band{band}"] = pa.array(
                ((hs >> np.uint64(16 * band)) & np.uint64(0xFFFF))
                .astype(np.int32))
        return pa.table(cols)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (unpackbits; no numpy>=2
    bitwise_count dependency)."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8)).reshape(-1, 64) \
        .sum(axis=1).astype(np.int64)


def _explode_simhash_bands(batch: pa.Table, *, id_col: str,
                           num_buckets: int) -> pa.Table:
    """(id, simhash, band0..3) rows -> (bucket, key, id, simhash)
    exploded rows. The collision key packs the band index above the
    16-bit band value (``value | band << 16``) — LOSSLESS, so run
    detection on one int is exactly (band, value) equality; bucket is
    the key folded to a bounded shuffle key."""
    n = batch.num_rows
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    sh = batch["simhash"].to_numpy(zero_copy_only=False)
    key = np.concatenate([
        batch[f"sh_band{b}"].to_numpy(zero_copy_only=False).astype(np.int64)
        | np.int64(b << 16)
        for b in range(4)])
    bucket = ((key.view(np.uint64) * np.uint64(0x9e37_79b9_7f4a_7c15))
              >> np.uint64(33)).astype(np.int64) % num_buckets
    return pa.table({
        "bucket": pa.array(bucket.astype(np.int32)),
        "key": pa.array(key, pa.int64()),
        id_col: pa.array(np.tile(ids, 4), pa.int64()),
        "simhash": pa.array(np.tile(sh, 4), pa.int64()),
    })


def _simhash_bucket_pairs(group: pa.Table, *, id_col: str, max_hamming: int,
                          cap: int = 50) -> pa.Table:
    """One bucket-shard: equal packed-(band, value) runs -> intra-run
    pairs, verified by exact 64-bit hamming distance, vectorized."""
    key = group["key"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    sh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    order = np.lexsort((ids, key))
    key, ids, sh = key[order], ids[order], sh[order]
    change = np.empty(len(key), dtype=bool)
    change[0] = True
    change[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(change)
    lens = np.append(starts[1:], len(key)) - starts
    a_idx: list[np.ndarray] = []
    b_idx: list[np.ndarray] = []
    for gi in np.flatnonzero(lens >= 2):
        s, L = starts[gi], min(int(lens[gi]), cap)
        iu, ju = np.triu_indices(L, k=1)
        a_idx.append(s + iu)
        b_idx.append(s + ju)
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if not a_idx:
        return empty
    ai = np.concatenate(a_idx)
    bi = np.concatenate(b_idx)
    dist = _popcount64(sh[ai] ^ sh[bi])
    keep = dist <= max_hamming
    if not keep.any():
        return empty
    a, b = ids[ai[keep]], ids[bi[keep]]
    return pa.table({
        "id_a": pa.array(np.minimum(a, b), pa.int64()),
        "id_b": pa.array(np.maximum(a, b), pa.int64()),
        "hamming": pa.array(dist[keep], pa.int64()),
    })


def simhash_dedup(ds: ray.data.Dataset, *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int | None = None,
                  target_bucket_rows: int = 65536,
                  cc: str = "auto", cc_driver_cap: int = 200_000) -> dict:
    """SimHash near-dup: docs sharing any 16-bit band are candidates
    (any pair within hamming ≤ 3 of 64 bits shares ≥1 of 4 bands —
    pigeonhole); verified by exact hamming distance INSIDE the bucket
    group (vectorized popcount), so only verified pairs exist
    downstream. Cross-band duplicate pairs collapse in a cluster-side
    ``groupby`` (the distance is exact, so min == any); connected
    components follow the shared ``cc`` policy of
    :func:`minhash_lsh_dedup`. Same adaptive-bucket shuffle shape as
    MinHash LSH: group size stays ~``target_bucket_rows`` regardless of
    corpus size."""
    from ray.data.aggregate import Min

    _require_int_ids(ds, id_col)
    if num_buckets is None:
        n_rows = ds.count()
        num_buckets = max(64, -(-n_rows * 4 // target_bucket_rows))
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=(1, _pool_size()),
    )
    exploded = sigs.map_batches(
        _explode_simhash_bands,
        fn_kwargs=dict(id_col=id_col, num_buckets=num_buckets),
        batch_format="pyarrow",
    )
    verified_ds = (
        exploded.groupby("bucket")
        .map_groups(lambda g: _simhash_bucket_pairs(
            g, id_col=id_col, max_hamming=max_hamming),
            batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    ).materialize()
    return _finish_dedup(ds, verified_ds, score_col="hamming",
                         id_col=id_col, cc=cc, cc_driver_cap=cc_driver_cap)


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
    max_brute_rows: int = 100_000,
    method: str = "auto",
) -> list[tuple[int, int, float]]:
    """All pairs with cosine ≥ threshold.

    ``method='auto'`` picks the exact O(n²) block-matmul path below the
    ``max_brute_rows`` cap and the distributed LSH-bucketed path
    (:func:`embedding_near_dup_lsh`) above it — the brute path
    materializes the vectors and must never see a 100 TB corpus."""
    if method == "lsh" or (method == "auto" and ds.count() > max_brute_rows):
        return embedding_near_dup_lsh(
            ds, threshold=threshold, vec_col=vec_col, id_col=id_col)
    return _embedding_near_dup_brute(
        ds, threshold=threshold, vec_col=vec_col, id_col=id_col, block=block)


def _embedding_near_dup_brute(
    ds: ray.data.Dataset,
    *,
    threshold: float,
    vec_col: str,
    id_col: str,
    block: int,
) -> list[tuple[int, int, float]]:
    """Exact small/medium-scale path: streams row-blocks against an
    accumulated normalized matrix (O(n²) matmul in blocks)."""
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
                if i == j:
                    # diagonal block generates both orders; keep one
                    if p >= q:
                        continue
                elif p > q:
                    p, q = q, p  # cross-block pairs appear once, any order
                out.append((p, q, float(sim[x, y])))
    return sorted(out)


class _MultiTableBucketer:
    """Actor-pool stage for the embedding near-dup scale path: emits one
    row per (table, doc) with a combined ``(table << nbits) | signbits``
    bucket key from ``n_tables`` independent sets of seeded random
    hyperplanes (multiple tables ≈ OR-amplification: a near-dup pair
    straddling one table's hyperplane still collides in another).
    Hyperplanes are built once per actor (seeded — identical across the
    pool); the per-batch work is one matmul."""

    def __init__(self, dim: int, nbits: int = 12, n_tables: int = 4,
                 seed: int = 5, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, nbits, dim))
        self.nbits, self.n_tables = nbits, n_tables
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from icat_lucene_ray.ops.similarity import _batch_matrix

        v = _batch_matrix(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        weights = (np.uint64(1) << np.arange(self.nbits, dtype=np.uint64))
        buckets = np.empty(self.n_tables * n, dtype=np.int64)
        for t in range(self.n_tables):
            bits = (v @ self.planes[t].T) > 0  # (n, nbits)
            key = (bits.astype(np.uint64) @ weights)
            buckets[t * n:(t + 1) * n] = (
                (np.uint64(t) << np.uint64(self.nbits)) | key
            ).astype(np.int64)
        # carry the vector through the shuffle for within-bucket verify
        vec = batch[self.vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        vecs_rep = pa.concat_arrays([vec] * self.n_tables)
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            self.id_col: pa.array(np.tile(ids, self.n_tables), pa.int64()),
            self.vec_col: vecs_rep,
        })


def _embedding_bucket_pairs(group: pa.Table, *, threshold: float,
                            vec_col: str, id_col: str,
                            cap: int = 8192) -> pa.Table:
    """Within-bucket exact cosine all-pairs (vectorized matmul). Groups
    larger than ``cap`` rows are truncated (id order) — degenerate
    buckets (e.g. the all-zero vector bucket) would otherwise go O(n²)."""
    from icat_lucene_ray.ops.similarity import _batch_matrix, _normalize

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    ids = group[id_col].to_numpy(zero_copy_only=False)
    if len(ids) < 2:
        return empty
    # one doc can appear once per table in the same folded bucket id —
    # dedup ids before pairing
    uniq, first = np.unique(ids, return_index=True)
    if len(uniq) < 2:
        return empty
    if len(uniq) > cap:
        first = first[:cap]
        uniq = uniq[:cap]
    sub = group.take(pa.array(first))
    v = _normalize(_batch_matrix(sub, vec_col))
    sim = v @ v.T
    iu, ju = np.triu_indices(len(uniq), k=1)
    s = sim[iu, ju]
    keep = s >= threshold
    if not keep.any():
        return empty
    a, b = uniq[iu[keep]], uniq[ju[keep]]
    return pa.table({
        "id_a": pa.array(np.minimum(a, b), pa.int64()),
        "id_b": pa.array(np.maximum(a, b), pa.int64()),
        "cosine": pa.array(s[keep], pa.float64()),
    })


def embedding_near_dup_lsh(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int = 12,
    n_tables: int = 4,
) -> list[tuple[int, int, float]]:
    """Distributed embedding near-dup: random-hyperplane buckets
    (``n_tables`` OR-amplified sign-bit tables) → ``groupby(bucket)`` →
    within-bucket exact cosine verify → driver dedup of the (small)
    verified-pair set. Approximate: a pair is found iff it collides in
    ≥1 table (recall grows with n_tables, shrinks with nbits).

    Partitioning assumption: bucket keys are ~uniform for non-degenerate
    embeddings; degenerate heavy buckets are truncated at the verify cap
    (documented in :func:`_embedding_bucket_pairs`)."""
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])
    exploded = ds.select_columns([id_col, vec_col]).map_batches(
        _MultiTableBucketer,
        fn_constructor_kwargs=dict(dim=dim, nbits=nbits, n_tables=n_tables,
                                   vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, _pool_size()),
    )
    pairs_tbl = (
        exploded.groupby("bucket")
        .map_groups(lambda g: _embedding_bucket_pairs(
            g, threshold=threshold, vec_col=vec_col, id_col=id_col),
            batch_format="pyarrow")
    ).to_pandas()  # verified pairs only
    seen: dict[tuple[int, int], float] = {}
    for a, b, c in zip(pairs_tbl["id_a"], pairs_tbl["id_b"],
                       pairs_tbl["cosine"]):
        seen[(int(a), int(b))] = float(c)
    return sorted((a, b, c) for (a, b), c in seen.items())
