"""Vectorized batch tokenization — the 100-TB hot path.

Strategy: Arrow's re2 kernel does the heavy splitting (maximal runs of
token-candidate characters — a strict superset of what the analyzer's
token regex can match, so splitting first is lossless); the per-token
Python chain (exact re-tokenize → possessive → lowercase → stop → stem
→ synonyms) runs only once per *unique* candidate per batch, memoized
across batches in the actor. On Zipfian text that is ~10× fewer Python
operations than per-token processing; everything else is numpy.

Equivalence with the scalar analyzer (``analyzer.term_freqs``) is
guaranteed by construction and pinned by a property test
(``tests/test_vectorized.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: candidate-run class: covers every char the analyzer token regex can
#: consume (\w ⊂ L+N+M+_, apostrophes, and . , inside numbers)
CANDIDATE_SPLIT = r"[^\p{L}\p{N}\p{M}_'’.,]+"


class VectorizedAnalyzer:
    """Wraps a scalar analyzer with a vectorized per-batch term-frequency
    kernel. One instance per actor (the candidate memo is the state)."""

    def __init__(self, analyzer, memo_cap: int = 1 << 20):
        self.an = analyzer
        self.split_pattern = getattr(analyzer, "candidate_split",
                                     CANDIDATE_SPLIT)
        self._memo: dict[str, tuple[str, ...]] = {}
        self._memo_pos: dict[str, tuple] = {}
        self._memo_presyn: dict[str, tuple] = {}
        self._memo_cap = memo_cap

    def term_freq_batch(self, texts: pa.ChunkedArray | pa.Array):
        """-> (offsets int64[n+1], terms pa.StringArray, tfs int32[],
        doc_lens int32[n]); per-doc term lists are sorted by batch-local
        stem id (deterministic)."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        toks = pc.split_pattern_regex(
            pc.coalesce(texts, ""), pattern=self.split_pattern)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        cand_lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), cand_lens)

        empty = (
            np.zeros(n + 1, dtype=np.int64),
            pa.array([], pa.string()),
            np.empty(0, dtype=np.int32),
            np.zeros(n, dtype=np.int32),
        )
        if len(flat) == 0:
            return empty

        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary.to_pylist()

        # per-unique-candidate expansion through the full scalar chain
        memo = self._memo
        stem_ids: dict[str, int] = {}
        exp_counts = np.empty(len(dictionary), dtype=np.int64)
        exp_values_list: list[int] = []
        # per-candidate base chain: analyzers with a multi-token stream
        # pass expose tokens_base so the pass runs once over the stream
        tokens_fn = getattr(self.an, "tokens_base", self.an.tokens)
        for ci, cand in enumerate(dictionary):
            stems = memo.get(cand)
            if stems is None:
                stems = tuple(tokens_fn(cand))
                if len(memo) < self._memo_cap:
                    memo[cand] = stems
            exp_counts[ci] = len(stems)
            for s in stems:
                sid = stem_ids.setdefault(s, len(stem_ids))
                exp_values_list.append(sid)
        exp_values = np.asarray(exp_values_list, dtype=np.int64)
        exp_offsets = np.zeros(len(dictionary) + 1, dtype=np.int64)
        np.cumsum(exp_counts, out=exp_offsets[1:])

        # expand candidate occurrences -> (doc, stem) postings
        n_out = exp_counts[codes]
        total = int(n_out.sum())
        if total == 0:
            return empty
        doc_rep = np.repeat(doc_idx, n_out)
        ends = np.cumsum(n_out)
        # range-expand: positions within each candidate's expansion
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - n_out, n_out)
        stems_rep = exp_values[np.repeat(exp_offsets[codes], n_out) + within]

        # multi-token synonym rules (SynonymGraphFilter insertion): match
        # consecutive stems of the PRE-SYNONYM stream (inserted tokens
        # never re-match, like Lucene), ADD the rule's extra stems to the
        # matching docs — vectorized per rule (rule sets are tiny)
        multi = getattr(self.an, "multi_synonyms", None)
        if multi:
            b_docs, b_stems = self._presyn_stream(codes, dictionary, doc_idx)
            extra_docs: list[np.ndarray] = []
            extra_stems: list[np.ndarray] = []
            N = len(b_stems)
            for seq, add in multi:
                L = len(seq)
                if N < L:
                    continue
                m = b_stems[: N - L + 1] == seq[0]
                for j in range(1, L):
                    m &= b_stems[j: N - L + 1 + j] == seq[j]
                m &= b_docs[: N - L + 1] == b_docs[L - 1:]
                hits = np.flatnonzero(m)
                if len(hits):
                    add_ids = np.array(
                        [stem_ids.setdefault(s, len(stem_ids)) for s in add],
                        dtype=np.int64)
                    extra_docs.append(np.repeat(b_docs[hits], len(add_ids)))
                    extra_stems.append(np.tile(add_ids, len(hits)))
            if extra_docs:
                doc_rep = np.concatenate([doc_rep] + extra_docs)
                stems_rep = np.concatenate([stems_rep] + extra_stems)

        K = len(stem_ids)
        key = doc_rep * K + stems_rep
        uniq, counts = np.unique(key, return_counts=True)
        out_doc = uniq // K
        out_stem = uniq % K
        doc_len = np.bincount(doc_rep, minlength=n).astype(np.int32)
        terms_per_doc = np.bincount(out_doc, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(terms_per_doc, out=offsets[1:])

        stem_table = pa.array(list(stem_ids.keys()), pa.string())
        terms = stem_table.take(pa.array(out_stem))
        return offsets, terms, counts.astype(np.int32), doc_len

    def _presyn_stream(self, codes: np.ndarray, dictionary: list[str],
                       doc_idx: np.ndarray):
        """(doc ids, pre-synonym stems as an object array) in stream
        order — the stream the multi-token synonym pass scans. Memoized
        per unique candidate like the main chain."""
        memo = self._memo_presyn
        presyn_fn = self.an.tokens_presyn
        counts = np.empty(len(dictionary), dtype=np.int64)
        vals: list[str] = []
        for ci, cand in enumerate(dictionary):
            got = memo.get(cand)
            if got is None:
                got = tuple(presyn_fn(cand))
                if len(memo) < self._memo_cap:
                    memo[cand] = got
            counts[ci] = len(got)
            vals.extend(got)
        val_arr = np.array(vals, dtype=object) if vals else \
            np.empty(0, dtype=object)
        offs = np.zeros(len(dictionary) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        n_out = counts[codes]
        total = int(n_out.sum())
        docs = np.repeat(doc_idx, n_out)
        ends = np.cumsum(n_out)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - n_out,
                                                              n_out)
        stems = val_arr[np.repeat(offs[codes], n_out) + within]
        return docs, stems

    def term_freq_batch_pos(self, texts: pa.ChunkedArray | pa.Array):
        """Positional variant (Q4): additionally returns ``pos_flat``
        int32 — the raw-token position of every occurrence, grouped per
        (doc, term) in exactly the order of the terms/tfs lists
        (ascending inside a posting). Position semantics pinned to
        ``analyzer.tokens_with_positions`` by a property test: stopped
        tokens advance positions; a candidate's expansions share its raw
        token's position."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        toks = pc.split_pattern_regex(
            pc.coalesce(texts, ""), pattern=self.split_pattern)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        cand_off = toks.offsets.to_numpy(zero_copy_only=False)
        cand_lens = np.diff(cand_off)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), cand_lens)

        empty = (
            np.zeros(n + 1, dtype=np.int64),
            pa.array([], pa.string()),
            np.empty(0, dtype=np.int32),
            np.zeros(n, dtype=np.int32),
            np.empty(0, dtype=np.int32),
        )
        if len(flat) == 0:
            return empty

        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary.to_pylist()

        memo = self._memo_pos
        stem_ids: dict[str, int] = {}
        exp_counts = np.empty(len(dictionary), dtype=np.int64)
        n_raw = np.empty(len(dictionary), dtype=np.int64)
        exp_values_list: list[int] = []
        exp_lpos_list: list[int] = []
        expand_fn = self.an.candidate_expansion
        for ci, cand in enumerate(dictionary):
            got = memo.get(cand)
            if got is None:
                got = expand_fn(cand)
                if len(memo) < self._memo_cap:
                    memo[cand] = got
            stems, lpos, nr = got
            exp_counts[ci] = len(stems)
            n_raw[ci] = nr
            for s, lp in zip(stems, lpos):
                exp_values_list.append(stem_ids.setdefault(s, len(stem_ids)))
                exp_lpos_list.append(lp)
        exp_values = np.asarray(exp_values_list, dtype=np.int64)
        exp_lpos = np.asarray(exp_lpos_list, dtype=np.int64)
        exp_offsets = np.zeros(len(dictionary) + 1, dtype=np.int64)
        np.cumsum(exp_counts, out=exp_offsets[1:])

        # per-occurrence base position = exclusive cumsum of raw-token
        # counts, reset at each doc's first candidate
        nr_occ = n_raw[codes]
        cs = np.zeros(len(codes) + 1, dtype=np.int64)
        np.cumsum(nr_occ, out=cs[1:])
        base = cs[:-1] - np.repeat(cs[cand_off[:-1]], cand_lens)

        n_out = exp_counts[codes]
        total = int(n_out.sum())
        if total == 0:
            return empty
        doc_rep = np.repeat(doc_idx, n_out)
        ends = np.cumsum(n_out)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - n_out, n_out)
        gsel = np.repeat(exp_offsets[codes], n_out) + within
        stems_rep = exp_values[gsel]
        pos_occ = np.repeat(base, n_out) + exp_lpos[gsel]

        K = len(stem_ids)
        key = doc_rep * K + stems_rep
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        pos_flat = pos_occ[order].astype(np.int32)
        change = np.empty(len(key_s), dtype=bool)
        change[0] = True
        np.not_equal(key_s[1:], key_s[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(key_s)))
        out_doc = key_s[starts] // K
        out_stem = key_s[starts] % K
        doc_len = np.bincount(doc_rep, minlength=n).astype(np.int32)
        terms_per_doc = np.bincount(out_doc, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(terms_per_doc, out=offsets[1:])

        stem_table = pa.array(list(stem_ids.keys()), pa.string())
        terms = stem_table.take(pa.array(out_stem))
        return offsets, terms, counts.astype(np.int32), doc_len, pos_flat
