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
    And, Boost, DisMax, Filter, Fuzzy, MatchAll, Not, Or, Phrase, Query,
    RangeFilter, Regexp, Term, Wildcard,
)
from icat_lucene_ray.query.engine import _levenshtein, _regexp_lower


class OracleIndex:
    def __init__(self, table: pa.Table, *, analyzer: str = "icat",
                 text_col: str = "text", text_cols: list[str] | None = None,
                 id_col: str | None = None, positions: bool = False,
                 key_col: str = "url", k1: float = 1.2, b: float = 0.75):
        self.an = get_analyzer(analyzer)
        self.k1, self.b = k1, b
        self.positions = positions
        #: stem -> doc -> sorted positions (built only when positions)
        self.pos_map: dict[str, dict[int, list[int]]] = defaultdict(
            lambda: defaultdict(list))
        if id_col:
            ids = table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            ids = hash_ids_from_strings(table[key_col])
        self.doc_ids = ids
        tcols = list(text_cols) if text_cols else [text_col]
        self.multi = len(tcols) > 1
        self.default_field = tcols[0]
        self.meta = {c: table[c].to_pylist() for c in table.column_names
                     if c not in tcols}
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        #: per-field doc lengths (single-field mode: one entry)
        self.field_dl: dict[str, dict[int, int]] = {f: {} for f in tcols}
        self.doc_len: dict[int, int] = {}
        for col in tcols:
            pfx = f"{col}:" if self.multi else ""
            dlmap = self.field_dl[col]
            for did, text in zip(ids, table[col].to_pylist()):
                c = Counter(self.an.tokens(text or ""))
                dlmap[int(did)] = sum(c.values())
                self.doc_len[int(did)] = (self.doc_len.get(int(did), 0)
                                          + sum(c.values()))
                for t, tf in c.items():
                    self.postings[pfx + t][int(did)] = tf
                if positions:
                    for t, p in self.an.tokens_with_positions(text or ""):
                        self.pos_map[pfx + t][int(did)].append(p)
        self.N = len(ids)
        self.field_avgdl = {
            f: (sum(m.values()) / self.N) if self.N else 1.0
            for f, m in self.field_dl.items()}
        self.avgdl = (sum(self.doc_len.values()) / self.N) if self.N else 1.0
        self._row_of = {int(d): i for i, d in enumerate(ids)}

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _field_of(self, stem: str) -> str:
        return stem.split(":", 1)[0] if self.multi else self.default_field

    def _stems(self, q) -> list[str]:
        """Analyzed + field-prefixed stems of a Term/Phrase (matches
        engine._term_stems)."""
        pfx = f"{q.field or self.default_field}:" if self.multi else ""
        texts = q.terms if hasattr(q, "terms") else (q.text,)
        return [pfx + s for t in texts for s in self.an.analyze_query_term(t)]

    def _score_stem(self, stem: str) -> dict[int, float]:
        p = self.postings.get(stem)
        if not p:
            return {}
        idf = self.idf(len(p))
        k1, b = self.k1, self.b
        field = self._field_of(stem)
        dlmap = self.field_dl[field]
        avgdl = self.field_avgdl[field]
        out = {}
        for did, tf in p.items():
            dl = dlmap[did]
            out[did] = idf * (tf * (k1 + 1.0)
                              / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        return out

    def _eval(self, q: Query):
        """-> (dict doc->score | None-score set)"""
        if isinstance(q, (Wildcard, Regexp, Fuzzy)) and q.field is not None \
                and q.field in self.meta and q.field not in self.field_dl:
            # META-column expansion (engine._expand_meta_values parity):
            # match the pattern against the column's distinct values,
            # then filter exactly — non-scoring, like Filter
            vals = {v for v in self.meta[q.field] if v is not None}
            if isinstance(q, Wildcard):
                rx = re.compile(fnmatch.translate(q.pattern.lower()))
                hit = {v for v in vals if rx.match(str(v).lower())}
            elif isinstance(q, Regexp):
                rx = re.compile(_regexp_lower(q.pattern))
                hit = {v for v in vals if rx.fullmatch(str(v).lower())}
            else:
                probe = q.text.lower()
                hit = {v for v in vals
                       if _levenshtein(str(v).lower(), probe) <= q.max_edits}
            col = self.meta[q.field]
            return ({int(d): 1.0 for d, v in zip(self.doc_ids, col)
                     if v in hit}, False)
        if isinstance(q, Term):
            stems = self._stems(q)
            out: dict[int, float] = {}
            for s in stems:
                for d, sc in self._score_stem(s).items():
                    out[d] = out.get(d, 0.0) + sc
            return out, True
        if isinstance(q, Phrase):
            stems = self._stems(q)
            if not stems:
                return {}, True
            # conjunction of already-analyzed stems (phrase-lite)
            base: dict[int, float] | None = None
            for s in stems:
                m = self._score_stem(s)
                base = dict(m) if base is None else {
                    d: base[d] + m[d] for d in base if d in m}
            base = base or {}
            if self.positions and len(stems) > 1:
                # true phrase: stem i at position p+i for a common p
                base = {
                    d: s for d, s in base.items()
                    if any(all(p + i in set(self.pos_map[stems[i]].get(d, ()))
                               for i in range(1, len(stems)))
                           for p in self.pos_map[stems[0]].get(d, ()))
                }
            return base, True
        if isinstance(q, Wildcard):
            pat = q.pattern.lower()
            if self.multi:
                pat = f"{q.field or self.default_field}:{pat}"
            rx = re.compile(fnmatch.translate(pat))
            out: dict[int, float] = {}
            for t in self.postings:
                if rx.match(t):
                    for d, sc in self._score_stem(t).items():
                        out[d] = out.get(d, 0.0) + sc
            return out, True
        if isinstance(q, Regexp):
            pat = _regexp_lower(q.pattern)
            rx = re.compile(pat)
            pref = f"{q.field or self.default_field}:" if self.multi else ""
            out: dict[int, float] = {}
            for t in self.postings:
                if t.startswith(pref) and rx.fullmatch(t[len(pref):]):
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
            cnt: dict[int, int] = {}
            for c in q.clauses:
                sub, _scored = self._eval(c)
                for d, sc in sub.items():
                    out[d] = out.get(d, 0.0) + sc
                    cnt[d] = cnt.get(d, 0) + 1
            if q.min_should > 1:
                out = {d: s for d, s in out.items()
                       if cnt[d] >= q.min_should}
            return out, True
        if isinstance(q, DisMax):
            per: dict[int, list] = {}
            for c in q.clauses:
                sub, _scored = self._eval(c)
                for d, sc in sub.items():
                    per.setdefault(d, []).append(sc)
            return {d: max(v) + q.tie * (sum(v) - max(v))
                    for d, v in per.items()}, True
        if isinstance(q, Not):
            pos, scored = self._eval(q.positive)
            neg, _ = self._eval(q.negative)
            return {d: s for d, s in pos.items() if d not in neg}, scored
        if isinstance(q, Boost):
            req, r_scored = self._eval(q.required)
            opt, _ = self._eval(q.optional)
            return {d: (s if r_scored else 0.0) + opt.get(d, 0.0)
                    for d, s in req.items()}, True
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

    def collapse_search(self, q: Query, dim: str, k: int = 10):
        """Brute-force field collapse: best (score desc, doc_id asc) doc
        per distinct ``dim`` value, relevance top-k over champions.
        -> list[(doc_id, score, key)]. NULL keys are excluded."""
        m, _scored = self._eval(q)
        best: dict = {}
        for d, v in zip(self.doc_ids, self.meta[dim]):
            did = int(d)
            if did not in m or v is None:
                continue
            s = m[did]
            cur = best.get(v)
            if cur is None or (s, -did) > (cur[1], -cur[0]):
                best[v] = (did, s)
        items = sorted(((did, s, v) for v, (did, s) in best.items()),
                       key=lambda x: (-x[1], x[0]))
        return items[:k]

    def facet(self, q: Query, dim: str) -> dict:
        m, _ = self._eval(q)
        c: dict = {}
        for d, v in zip(self.doc_ids, self.meta[dim]):
            if int(d) in m:
                c[v] = c.get(v, 0) + 1
        return c
