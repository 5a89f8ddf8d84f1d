"""Text-analysis operators for large-scale training-data pipelines.

All are stateless-or-actor ``map_batches`` stages over a text column:
token counting, quality scoring, language ID, document fingerprinting.
Formulas are deliberately simple + deterministic so a SQL oracle can
reproduce them exactly (driver correctness gate).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# the quality/stopword metric uses a tiny fixed English list (SQL-mirrorable)
QUALITY_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

# BPE-ish word/number/punct splitter for token counting
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "n_tokens") -> pa.Table:
    """Whitespace token count, fully vectorized in Arrow
    (= ``len(string_split(text, ' '))`` in SQL)."""
    n = pc.list_value_length(pc.split_pattern(batch[col], " "))
    return batch.append_column(out, n.cast(pa.int64()))


def add_bpe_token_count(batch: pa.Table, col: str = "text",
                        out: str = "n_bpe_tokens") -> pa.Table:
    """Regex (BPE-ish: letter runs / digit runs / single punct) token
    count via Arrow's vectorized regex extract-all."""
    counts = pc.list_value_length(
        pc.extract_regex_span(batch[col], _BPE_RE.pattern)
    ) if hasattr(pc, "extract_regex_span") else pa.array(
        [len(_BPE_RE.findall(t or "")) for t in batch[col].to_pylist()],
        pa.int64(),
    )
    return batch.append_column(out, counts.cast(pa.int64()))


def add_quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality metrics: n_chars, n_tokens, avg token length, stop-word
    ratio, and a combined score. Vectorized Arrow kernels only."""
    text = batch[col]
    n_chars = pc.utf8_length(text).cast(pa.float64())
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(toks).cast(pa.float64())
    # avg token length for space-joined text: (chars - (n-1)) / n
    avg_tok = pc.divide(
        pc.subtract(n_chars, pc.subtract(n_tokens, pa.scalar(1.0))), n_tokens)
    # token-exact stop-word hits (== SQL list_filter semantics):
    # flatten token lists, is_in membership, segment-sum via reduceat
    toks_arr = toks.combine_chunks()
    if isinstance(toks_arr, pa.ChunkedArray):
        toks_arr = toks_arr.combine_chunks()
    flat = toks_arr.flatten()
    member = pc.is_in(flat, value_set=pa.array(QUALITY_STOPWORDS)) \
        .cast(pa.int8()).to_numpy(zero_copy_only=False)
    offsets = toks_arr.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    starts = offsets[:-1].astype(np.int64)
    sums = np.zeros(len(lens), dtype=np.float64)
    nz = lens > 0
    if member.size and nz.any():
        sums[nz] = np.add.reduceat(member.astype(np.float64), starts[nz])
    stop_ratio = pc.divide(pa.array(sums), n_tokens)
    score = pc.multiply(
        pc.min_element_wise(pc.divide(n_tokens, pa.scalar(100.0)), pa.scalar(1.0)),
        pc.subtract(pa.scalar(1.0), stop_ratio),
    )
    out = batch
    for name, arr in [("n_tokens", n_tokens.cast(pa.int64())),
                      ("avg_token_len", avg_tok),
                      ("stop_ratio", stop_ratio),
                      ("quality", score)]:
        out = out.append_column(name, arr)
    return out


# ---------------------------------------------------------------------------
# language ID — character-n-gram/stopword heuristic (actor-pool stage)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was with as his on be at by".split()),
    "de": frozenset("der die das und ist nicht von mit den ein eine zu auf für".split()),
    "fr": frozenset("le la les et de des un une est pas pour que dans sur".split()),
    "es": frozenset("el la los las y de que en un una es no por con para".split()),
}


class LangId:
    """Actor-pool language-ID stage: marker tables built once per actor.
    Deterministic stopword-overlap heuristic; emits 'und' when no
    language scores above ``min_hits`` markers. Vectorized: Arrow re2
    word split + is_in membership over the flat token stream, per-doc
    per-language hit counts via one bincount each."""

    def __init__(self, col: str = "text", out: str = "lang_pred",
                 min_hits: int = 2):
        self.col, self.out, self.min_hits = col, out, min_hits
        self.langs = list(_LANG_MARKERS)
        self.marker_arrays = {
            lang: pa.array(sorted(m)) for lang, m in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        lower = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.coalesce(texts, ""), 0, 2000))
        toks = pc.split_pattern_regex(lower, pattern=r"[^a-zäöüßéèêàçñ]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        if len(flat):
            for li, lang in enumerate(self.langs):
                m = pc.is_in(flat, value_set=self.marker_arrays[lang]) \
                    .to_numpy(zero_copy_only=False)
                hits[li] = np.bincount(doc_rep, weights=m, minlength=n)
        # winner = first language (declaration order) with the strictly
        # highest count above the threshold — same tie discipline as the
        # scalar reference loop
        best = hits.argmax(axis=0)
        ok = hits.max(axis=0) >= self.min_hits
        lang_arr = np.array(self.langs + ["und"])
        preds = lang_arr[np.where(ok, best, len(self.langs))]
        return batch.append_column(self.out, pa.array(preds, pa.string()))


#: (name, RE2 pattern, replacement) — order matters: emails first so a
#: digit run inside a local-part is never half-redacted as a phone.
#: RE2-only syntax (\b is ASCII word boundary) so the SAME patterns run
#: in a DuckDB oracle (regexp_replace ... 'g' / regexp_extract_all).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(batch: pa.Table, col: str = "text",
               out: str = "clean_text", count_col: str = "n_pii") -> pa.Table:
    """Replace emails / SSNs / phone numbers / IPv4s with typed tags and
    count the redactions. Vectorized RE2 kernels; a standard pre-train
    scrub stage (the tags keep token positions roughly stable for
    downstream dedup)."""
    x = batch[col]
    n = None
    for _name, pat, repl in PII_PATTERNS:
        c = pc.count_substring_regex(x, pat)
        n = c if n is None else pc.add(n, c)
        x = pc.replace_substring_regex(x, pattern=pat, replacement=repl)
    return batch.append_column(out, x) \
                .append_column(count_col, n.cast(pa.int64()))


def add_repetition_metrics(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals, fully vectorized:

    - ``dup_word_frac``  = 1 - distinct_words / n_words
    - ``top_bigram_frac`` = count(most frequent bigram) / (n_words - 1)

    Both are exact (not sketched) and SQL-mirrorable (``list_distinct``
    / bigram ``list_transform`` + group-max in DuckDB). Boilerplate-
    heavy web pages score high on both; LLM-data quality filters drop
    the tail (Gopher rules: dup-line/dup-ngram fractions).
    """
    toks = pc.split_pattern(batch[col], " ")
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    ndocs = len(lens)
    codes = arr.flatten().dictionary_encode() \
        .indices.to_numpy(zero_copy_only=False).astype(np.int64)
    didx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)

    # distinct words per doc: sort (doc, code), count group firsts
    order = np.lexsort((codes, didx))
    dd, cc = didx[order], codes[order]
    new = np.empty(len(dd), dtype=bool)
    if len(dd):
        new[0] = True
        new[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
    n_distinct = np.bincount(dd[new], minlength=ndocs) if len(dd) \
        else np.zeros(ndocs, np.int64)
    dup = np.where(lens > 0, 1.0 - n_distinct / np.maximum(lens, 1), 0.0)

    # top bigram per doc: within-doc adjacent pairs, group counts, max
    top = np.zeros(ndocs, dtype=np.float64)
    if len(codes) > 1:
        mask = didx[:-1] == didx[1:]
        d2, c1, c2 = didx[:-1][mask], codes[:-1][mask], codes[1:][mask]
        if len(d2):
            o = np.lexsort((c2, c1, d2))
            d2s, c1s, c2s = d2[o], c1[o], c2[o]
            nb = np.empty(len(d2s), dtype=bool)
            nb[0] = True
            nb[1:] = ((d2s[1:] != d2s[:-1]) | (c1s[1:] != c1s[:-1])
                      | (c2s[1:] != c2s[:-1]))
            starts = np.flatnonzero(nb)
            counts = np.diff(np.append(starts, len(d2s)))
            dstart = d2s[starts]
            fod = np.empty(len(dstart), dtype=bool)
            fod[0] = True
            fod[1:] = dstart[1:] != dstart[:-1]
            gb = np.flatnonzero(fod)
            docs_with = dstart[gb]
            top[docs_with] = (np.maximum.reduceat(counts, gb)
                              / (lens[docs_with] - 1))
    out = batch
    for name, vals in [("dup_word_frac", dup), ("top_bigram_frac", top)]:
        out = out.append_column(name, pa.array(np.round(vals, 6)))
    return out


# ---------------------------------------------------------------------------
# corpus-level statistics (two-pass: global aggregate -> broadcast -> score)
# ---------------------------------------------------------------------------

def _word_counts_partial(batch: pa.Table, col: str) -> pa.Table:
    """Per-batch combiner: collapse a block to (word, c) partial counts
    so the global ``groupby(word)`` shuffles vocabulary-sized rows,
    never per-token rows."""
    flat = pc.split_pattern(batch[col], " ")
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    enc = flat.flatten().dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    c = np.bincount(idx, minlength=len(enc.dictionary))
    return pa.table({"word": enc.dictionary,
                     "c": pa.array(c.astype(np.int64))})


def unigram_logprob(ds, col: str = "text", id_col: str = "doc_id",
                    min_count: int = 2, out: str = "bits_per_word"):
    """Per-doc mean unigram surprisal (bits/word) under the CORPUS
    unigram model — the classic cheap LM-quality proxy (gibberish and
    rare-token spam score high; boilerplate scores low).

    Two-pass: (1) global word counts via per-batch combiners + one
    small ``groupby(word)``; words with count >= ``min_count`` form the
    model (count thresholding, not top-k — deterministic under ties),
    everything else gets the 0.5-count OOV floor. (2) the model is
    broadcast once (``ray.put``) and a ``map_batches`` stage scores
    docs vectorized (dictionary-encode + hashmap lookup on UNIQUE
    batch words only, reduceat per doc).

    Scale note: the broadcast is O(model vocabulary) — thresholded
    web-scale vocabs are ~10^7 entries (~100 MB), a per-node constant,
    NOT per-batch traffic.
    """
    import ray

    counts = ds.map_batches(lambda b: _word_counts_partial(b, col),
                            batch_format="pyarrow") \
               .groupby("word").sum("c")
    total = 0
    model: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        cs = b["sum(c)"].to_numpy(zero_copy_only=False)
        total += int(cs.sum())
        keep = cs >= min_count
        if keep.any():
            for w, c, k in zip(b["word"].to_pylist(), cs, keep):
                if k:
                    model[w] = int(c)
    model_ref = ray.put(model)

    def _score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = ray.get(model_ref)
        toks = pc.split_pattern(batch[col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        enc = toks.flatten().dictionary_encode()
        uniq = pd.Index(enc.dictionary.to_pylist())
        ucnt = uniq.map(m).fillna(0.5).to_numpy(dtype=np.float64)
        bits_u = -np.log2(ucnt / total)
        bits = bits_u[enc.indices.to_numpy(zero_copy_only=False)]
        sums = np.zeros(len(lens), dtype=np.float64)
        nz = lens > 0
        if bits.size and nz.any():
            sums[nz] = np.add.reduceat(bits, offsets[:-1][nz])
        mean = np.divide(sums, lens, out=np.zeros_like(sums),
                         where=lens > 0)
        return pa.table({id_col: batch[id_col],
                         out: pa.array(np.round(mean, 6))})

    return ds.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def add_md5_fingerprint(batch: pa.Table, col: str = "text",
                        out: str = "fp_md5") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (= ``md5(text)`` in
    SQL — the exact-dedup key)."""
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
           for t in batch[col].to_pylist()]
    return batch.append_column(out, pa.array(fps, pa.string()))


def rolling_hashes(tokens: list[str], window: int = 5,
                   base: int = 1_000_003, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Rabin-Karp rolling hashes over token windows (winnowing building
    block). Deterministic; each token contributes its blake2b-8 value."""
    if len(tokens) < window:
        tokens = tokens + ["\x00"] * (window - len(tokens))
    vals = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
         % mod for t in tokens],
        dtype=np.uint64,
    )
    n = len(vals) - window + 1
    out = np.zeros(n, dtype=np.uint64)
    poww = pow(base, window - 1, mod)
    h = 0
    for i, v in enumerate(vals[:window]):
        h = (h * base + int(v)) % mod
    out[0] = h
    for i in range(1, n):
        h = ((h - int(vals[i - 1]) * poww) * base + int(vals[i + window - 1])) % mod
        out[i] = h % mod
    return out


class WinnowFingerprint:
    """Actor-pool stage: winnowing document fingerprint — min rolling
    hash per sliding window band → compact int64 list per doc (used for
    plagiarism-style overlap detection)."""

    def __init__(self, col: str = "text", out: str = "fp_winnow",
                 window: int = 5, stride: int = 16):
        self.col, self.out = col, out
        self.window, self.stride = window, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from icat_lucene_ray.ops.dedup import (_TokenHasher, _shingle_hash_batch,
                                               _tokenize_flat)

        if not hasattr(self, "_hasher"):
            self._hasher = _TokenHasher()
        offs, th = _tokenize_flat(batch[self.col], self._hasher)
        sh_off, hs = _shingle_hash_batch(offs, th, self.window)
        # strided per-doc min: one global reduceat over the concatenated
        # stride-start positions of every doc
        n = len(sh_off) - 1
        m = np.diff(sh_off)
        n_chunks = -(-m // self.stride)
        starts_parts = [
            sh_off[d] + np.arange(0, m[d], self.stride, dtype=np.int64)
            for d in range(n)
        ]
        if hs.size:
            starts = np.concatenate(starts_parts)
            mins = (np.minimum.reduceat(hs, starts)
                    & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        else:
            mins = np.empty(0, dtype=np.int64)
        chunk_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_chunks, out=chunk_off[1:])
        lists = pa.ListArray.from_arrays(pa.array(chunk_off, pa.int32()),
                                         pa.array(mins))
        return batch.append_column(self.out, lists)


def top_tfidf_terms(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3, min_df: int = 1):
    """Per-doc top-k TF-IDF terms (keyword extraction): score =
    tf * ln(N / df), ties broken by term string ascending.

    Two passes, mirroring :func:`unigram_logprob`'s broadcast-model
    shape: (1) global document frequencies via per-batch per-doc
    DISTINCT term combiners + one vocab-sized ``groupby(term)``;
    (2) the thresholded df table broadcasts once (``ray.put`` — a
    per-node constant, like the unigram model) and a stateless
    ``map_batches`` scores each doc and keeps its top k vectorized
    (lexsort ranks, no per-doc Python). Output rows:
    (id_col, term, score, rank).
    """
    import pandas as pd
    import ray

    def _doc_distinct_terms(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        enc = arr.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = max(1, len(enc.dictionary))
        uniq = np.unique(doc_rep * K + codes)
        # per-batch combine: term -> number of docs containing it
        cnt = np.bincount((uniq % K), minlength=K)
        nz = np.flatnonzero(cnt)
        return pa.table({"term": enc.dictionary.take(pa.array(nz)),
                         "c": pa.array(cnt[nz], pa.int64())})

    n_docs = ds.count()
    dfs = ds.map_batches(_doc_distinct_terms, batch_format="pyarrow") \
        .groupby("term").sum("c")
    model: dict[str, int] = {}
    for b in dfs.iter_batches(batch_format="pyarrow"):
        for t, c in zip(b["term"].to_pylist(),
                        b["sum(c)"].to_numpy(zero_copy_only=False)):
            if c >= min_df:
                model[t] = int(c)
    model_ref = ray.put(model)

    def _score(b: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        toks = pc.split_pattern(b[text_col], " ")
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        ndocs = len(lens)
        doc_rep = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
        enc = arr.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = max(1, len(enc.dictionary))
        uniq, tf = np.unique(doc_rep * K + codes, return_counts=True)
        u_doc, u_code = uniq // K, uniq % K
        terms = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        df_u = pd.Index(terms).map(m).to_numpy(dtype=np.float64,
                                               na_value=np.nan)
        dfv = df_u[u_code]
        ok = ~np.isnan(dfv)
        u_doc, u_code, tf, dfv = u_doc[ok], u_code[ok], tf[ok], dfv[ok]
        score = tf * np.log(n_docs / dfv)
        tstr = terms[u_code].astype(str)
        order = np.lexsort((tstr, -score, u_doc))
        od, osc = u_doc[order], score[order]
        rank = np.arange(len(od), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, od[1:] != od[:-1]])
        base = np.zeros(len(od), dtype=np.int64)
        base[starts] = rank[starts]
        np.maximum.accumulate(base, out=base)
        rk = rank - base
        keep = rk < k
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[od[keep]]),
            "term": pa.array(tstr[order][keep], pa.string()),
            "score": pa.array(np.round(osc[keep], 6)),
            "rank": pa.array(rk[keep] + 1),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-document repeated n-grams — memorization-risk audit
# ---------------------------------------------------------------------------

def repeated_ngrams(ds, *, n: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 256, top_k: int = 100):
    """Token n-grams that repeat across >= ``min_docs`` DISTINCT
    documents — the standard memorization-risk audit over a training
    corpus (verbatim spans shared by many documents are what models
    memorize; boilerplate, licenses, templates).

    Vectorized n-gram construction (one Arrow ``binary_join`` of n
    shifted takes of the flat token stream; no per-row Python), distinct
    per doc, then a BUCKETED groupby on ``hash(ngram) % num_buckets`` —
    the exchange key space is the bucket count, never the ~O(corpus)
    distinct-n-gram cardinality — with one vectorized value_counts per
    bucket call. Returns (ngram, n_docs) for survivors, sorted
    (n_docs DESC, ngram) LIMIT ``top_k`` — scale note: survivors are
    rare by construction (cross-doc repeats), so the driver-side sort
    input is small; raise ``min_docs`` with corpus size."""
    import ray

    def _emit(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.coalesce(texts, ""), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_all = toks.flatten()
        keep = pc.not_equal(pc.utf8_length(flat_all), 0)
        lens_all = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        keep_np = keep.to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), lens_all)
        doc_rep = doc_rep[keep_np]
        flat = flat_all.filter(keep)
        lens = np.bincount(doc_rep, minlength=len(ids))
        offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        # window starts: docs with >= n tokens contribute len-n+1 windows
        m = np.maximum(lens - n + 1, 0)
        M = int(m.sum())
        if M == 0:
            return pa.table({"_nbkt": pa.array([], pa.int64()),
                             "ngram": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64())})
        woff = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(m, out=woff[1:])
        within = np.arange(M, dtype=np.int64) - np.repeat(woff[:-1], m)
        start = np.repeat(offs[:-1], m) + within
        cols = [flat.take(pa.array(start + j)) for j in range(n)]
        # interleave explicit space columns (join_element_wise has one
        # global separator, we want tok1 ' ' tok2 ' ' ... tokn)
        parts: list = []
        space = pa.array([" "] * M)
        for j in range(n):
            parts.append(cols[j])
            if j < n - 1:
                parts.append(space)
        ngram = pc.binary_join_element_wise(*parts, pa.array([""] * M))
        # distinct per doc: dictionary-encode + unique on (doc, code)
        enc = ngram.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = max(1, len(enc.dictionary))
        pos = np.arange(len(ids))
        drep = np.repeat(pos, m)
        uniq = np.unique(drep * K + codes)
        u_doc, u_code = uniq // K, uniq % K
        out_ng = enc.dictionary.take(pa.array(u_code))
        # bucket via md5 of the ngram (python per UNIQUE ngram only)
        bkt = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                            "little") % num_buckets
             for s in out_ng.to_pylist()),
            dtype=np.int64, count=len(out_ng))
        return pa.table({
            "_nbkt": pa.array(bkt),
            "ngram": out_ng.cast(pa.string()),
            id_col: pa.array(ids[u_doc], pa.int64()),
        })

    def _count(g: pa.Table) -> pa.Table:
        ng = g["ngram"]
        if isinstance(ng, pa.ChunkedArray):
            ng = ng.combine_chunks()
        enc = ng.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        ok = np.flatnonzero(cnt >= min_docs)
        return pa.table({
            "ngram": enc.dictionary.take(pa.array(ok)).cast(pa.string()),
            "n_docs": pa.array(cnt[ok], pa.int64()),
        })

    survivors = (ds.map_batches(_emit, batch_format="pyarrow")
                   .groupby("_nbkt")
                   .map_groups(_count, batch_format="pyarrow"))
    t = survivors.to_pandas()
    t = t.sort_values(["n_docs", "ngram"],
                      ascending=[False, True]).head(top_k)
    return pa.table({
        "ngram": pa.array(t["ngram"], pa.string()),
        "n_docs": pa.array(t["n_docs"].astype(int), pa.int64()),
    })


def _tokenize_flat(texts, ids, id_col_dtype=np.int64):
    """Shared tokenization for window ops: split on whitespace, drop
    empty tokens. Returns (flat tokens StringArray, per-doc lens,
    per-doc flat offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.coalesce(texts, ""), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat_all = toks.flatten()
    keep = pc.not_equal(pc.utf8_length(flat_all), 0)
    lens_all = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), lens_all)
    doc_rep = doc_rep[keep_np]
    flat = flat_all.filter(keep)
    lens = np.bincount(doc_rep, minlength=len(ids))
    offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return flat, lens, offs


def _token_hashes(flat) -> np.ndarray:
    """64-bit md5 hash per token, computed once per UNIQUE token in the
    batch (Python loop bounded by batch vocabulary, not token count)."""
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_h = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in enc.dictionary.to_pylist()),
        dtype=np.uint64, count=len(enc.dictionary))
    return uniq_h[codes] if len(codes) else np.empty(0, np.uint64)


def substring_dedup(ds, *, min_len: int = 8, text_col: str = "text",
                    id_col: str = "doc_id", num_buckets: int = 256,
                    join_buckets: int = 64):
    """Exact substring deduplication (the semantics of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    restated over fixed-width token windows instead of a suffix array):
    any run of ``min_len`` consecutive whitespace tokens whose text
    occurs >= 2 times across the corpus (ALL occurrences counted —
    same-document repeats included) is duplicated; every token covered
    by a duplicated window is removed and the document is rebuilt from
    the survivors (single-space joined, so whitespace is normalized for
    every doc). Returns (id_col, text, removed).

    Three bucketed stages, each linear in corpus tokens:

    1. ``map_batches``: per window start, a 64-bit polynomial hash over
       per-token hashes (``min_len`` vectorized uint64 mul-adds) ->
       rows (bucket, h, doc, pos). This O(tokens) exchange is the
       dominant cost — the same volume class as the index build's
       posting exchange, and like it the key space is
       ``hash % num_buckets``, never the distinct-window cardinality.
    2. ``groupby`` on the hash bucket: one vectorized value-count per
       bucket keeps window starts whose hash repeats. Survivors are
       rare by construction (cross-corpus verbatim repeats).
    3. Docs UNION duplicated starts, bucketed by doc hash
       (``join_buckets``), one vectorized rebuild per bucket: flat
       token mask + ListArray re-slice + ``binary_join`` — no per-row
       Python.

    A 64-bit collision can mark a non-duplicated window (expected count
    ~ tokens^2 / 2^64 — negligible below ~10^8 tokens per distinct
    window text, and harmless-by-kind for curation: it removes a span,
    never corrupts one). The SQL oracle recomputes with exact gram
    strings, keeping the correctness gate honest at test scale."""
    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    P = np.uint64(1099511628211)  # FNV-1a prime, odd -> bijective mul

    def _emit(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        flat, lens, offs = _tokenize_flat(b[text_col], ids)
        m = np.maximum(lens - L + 1, 0)
        M = int(m.sum())
        if M == 0:
            return pa.table({"_sb": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        th = _token_hashes(flat)
        woff = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(m, out=woff[1:])
        within = np.arange(M, dtype=np.int64) - np.repeat(woff[:-1], m)
        start = np.repeat(offs[:-1], m) + within
        h = np.zeros(M, dtype=np.uint64)
        for j in range(L):
            h = h * P + th[start + j]
        return pa.table({
            "_sb": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "h": pa.array(h.view(np.int64)),
            id_col: pa.array(np.repeat(ids, m), pa.int64()),
            "pos": pa.array(within),
        })

    def _dups(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = cnt[inv] >= 2
        return pa.table({
            id_col: pa.array(
                g[id_col].to_numpy(zero_copy_only=False)[dup], pa.int64()),
            "pos": pa.array(
                g["pos"].to_numpy(zero_copy_only=False)[dup], pa.int64()),
        })

    dup_starts = (ds.map_batches(_emit, batch_format="pyarrow")
                    .groupby("_sb")
                    .map_groups(_dups, batch_format="pyarrow"))

    schema = pa.schema([(id_col, pa.int64()), ("__side", pa.int8()),
                        ("text", pa.string()), ("pos", pa.int64())])

    def _tag(b: pa.Table, is_doc: bool) -> pa.Table:
        n = b.num_rows
        t = pa.table({
            id_col: b[id_col],
            "__side": pa.array(np.full(n, 0 if is_doc else 1, np.int8)),
            "text": b[text_col] if is_doc else pa.nulls(n, pa.string()),
            "pos": pa.nulls(n, pa.int64()) if is_doc else b["pos"],
        }).cast(schema)
        k = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = ((k * 2654435761) & 0x7FFFFFFF) % join_buckets
        return t.append_column("_jb", pa.array(bkt.astype(np.int64)))

    tagged = (ds.map_batches(lambda b: _tag(b, True),
                             batch_format="pyarrow")
                .union(dup_starts.map_batches(lambda b: _tag(b, False),
                                              batch_format="pyarrow")))

    def _rebuild(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(side == 0))
        dups = g.filter(pa.array(side == 1))
        ids = docs[id_col].to_numpy(zero_copy_only=False)
        flat, lens, offs = _tokenize_flat(docs["text"], ids)
        total = int(offs[-1])
        removed = np.zeros(len(ids), np.int64)
        if dups.num_rows and len(ids):
            order = np.argsort(ids)
            d_ids = dups[id_col].to_numpy(zero_copy_only=False)
            row = order[np.searchsorted(ids[order], d_ids)]
            d_pos = dups["pos"].to_numpy(zero_copy_only=False)
            cov = (offs[row][:, None] + d_pos[:, None]
                   + np.arange(L, dtype=np.int64)[None, :]).ravel()
            mask = np.zeros(total, bool)
            mask[cov] = True
            tok_doc = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            removed = np.bincount(tok_doc[mask], minlength=len(ids))
            kept = flat.filter(pa.array(~mask))
        else:
            kept = flat
        kept_lens = lens - removed
        kept_offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_lens, out=kept_offs[1:])
        lst = pa.ListArray.from_arrays(pa.array(kept_offs, pa.int32()),
                                       kept.combine_chunks()
                                       if isinstance(kept, pa.ChunkedArray)
                                       else kept)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "text": pc.binary_join(lst, " "),
            "removed": pa.array(removed, pa.int64()),
        })

    return tagged.groupby("_jb").map_groups(_rebuild,
                                            batch_format="pyarrow")
