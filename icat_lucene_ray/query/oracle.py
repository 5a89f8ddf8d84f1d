"""Brute-force reference oracle.

Mirrors the reference's test strategy (``TestLucene.java``): tiny
in-memory index with exact expected outputs. The oracle tokenizes the
corpus with the SAME analyzer and scores BM25 with the same formula but
via naive per-doc dictionaries — totally independent of the segment /
codec / shuffle machinery — so rank-identical agreement is meaningful
(FIXTURES.md §3).
"""

from __future__ import annotations

import fnmatch
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.index.docids import hash_ids_from_strings
from icat_lucene_ray.query.ast import (
    And, Filter, MatchAll, Not, Or, Phrase, Query, RangeFilter, Term, Wildcard,
)


class OracleIndex:
    def __init__(self, table: pa.Table, *, analyzer: str = "icat",
                 text_col: str = "text", id_col: str | None = None,
                 key_col: str = "url", k1: float = 1.2, b: float = 0.75):
        self.an = get_analyzer(analyzer)
        self.k1, self.b = k1, b
        if id_col:
            ids = table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            ids = hash_ids_from_strings(table[key_col])
        self.doc_ids = ids
        self.meta = {c: table[c].to_pylist() for c in table.column_names
                     if c != text_col}
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for did, text in zip(ids, table[text_col].to_pylist()):
            c = Counter(self.an.tokens(text or ""))
            self.doc_len[int(did)] = sum(c.values())
            for t, tf in c.items():
                self.postings[t][int(did)] = tf
        self.N = len(ids)
        self.avgdl = (sum(self.doc_len.values()) / self.N) if self.N else 1.0
        self._row_of = {int(d): i for i, d in enumerate(ids)}

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _score_stem(self, stem: str) -> dict[int, float]:
        p = self.postings.get(stem)
        if not p:
            return {}
        idf = self.idf(len(p))
        k1, b = self.k1, self.b
        out = {}
        for did, tf in p.items():
            dl = self.doc_len[did]
            out[did] = idf * (tf * (k1 + 1.0)
                              / (tf + k1 * (1.0 - b + b * dl / self.avgdl)))
        return out

    def _eval(self, q: Query):
        """-> (dict doc->score | None-score set)"""
        if isinstance(q, Term):
            stems = self.an.analyze_query_term(q.text)
            out: dict[int, float] = {}
            for s in stems:
                for d, sc in self._score_stem(s).items():
                    out[d] = out.get(d, 0.0) + sc
            return out, True
        if isinstance(q, Phrase):
            stems = [s for t in q.terms for s in self.an.analyze_query_term(t)]
            return self._eval(And([Term(s) for s in stems])) if stems else ({}, True)
        if isinstance(q, Wildcard):
            rx = re.compile(fnmatch.translate(q.pattern.lower()))
            out: dict[int, float] = {}
            for t in self.postings:
                if rx.match(t):
                    for d, sc in self._score_stem(t).items():
                        out[d] = out.get(d, 0.0) + sc
            return out, True
        if isinstance(q, MatchAll):
            return {int(d): 1.0 for d in self.doc_ids}, False
        if isinstance(q, Filter):
            vals = set(q.values)
            col = self.meta[q.field_name]
            return ({int(d): 1.0 for d, v in zip(self.doc_ids, col) if v in vals},
                    False)
        if isinstance(q, RangeFilter):
            col = self.meta[q.field_name]
            out = {}
            for d, v in zip(self.doc_ids, col):
                if v is None:
                    continue
                if q.lo is not None and (v < q.lo if q.include_lo else v <= q.lo):
                    continue
                if q.hi is not None and (v > q.hi if q.include_hi else v >= q.hi):
                    continue
                out[int(d)] = 1.0
            return out, False
        if isinstance(q, Or):
            out: dict[int, float] = {}
            for c in q.clauses:
                sub, _scored = self._eval(c)
                for d, sc in sub.items():
                    out[d] = out.get(d, 0.0) + sc
            return out, True
        if isinstance(q, Not):
            pos, scored = self._eval(q.positive)
            neg, _ = self._eval(q.negative)
            return {d: s for d, s in pos.items() if d not in neg}, scored
        if isinstance(q, And):
            subs = [self._eval(c) for c in q.clauses]
            filt = [self._eval(f) for f in q.filters]
            if not subs and not filt:
                return {}, True
            any_scored = any(s for _m, s in subs)
            base = None
            for m, scored in subs:
                contrib = m if scored else {d: 0.0 for d in m}
                if base is None:
                    base = dict(contrib)
                else:
                    base = {d: base[d] + contrib[d] for d in base if d in contrib}
            if base is None:
                base = {d: 0.0 for d in self._row_of}
            for m, _s in filt:
                base = {d: s for d, s in base.items() if d in m}
            if not any_scored:
                base = {d: 1.0 for d in base}
            return base, any_scored
        raise TypeError(type(q))

    def search(self, q: Query, k: int = 10, search_after: dict | None = None):
        """-> list[(doc_id, score)] rank: score desc, doc_id asc."""
        m, _scored = self._eval(q)
        items = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))
        if search_after is not None:
            key = (-float(search_after["score"]), int(search_after["doc_id"]))
            items = [it for it in items if (-it[1], it[0]) > key]
        return items[:k]

    def count(self, q: Query) -> int:
        return len(self._eval(q)[0])

    def facet(self, q: Query, dim: str) -> dict:
        m, _ = self._eval(q)
        c: dict = {}
        for d, v in zip(self.doc_ids, self.meta[dim]):
            if int(d) in m:
                c[v] = c.get(v, 0) + 1
        return c
