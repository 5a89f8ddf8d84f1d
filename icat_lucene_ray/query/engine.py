"""Query execution — BM25 top-k over immutable segments.

Reimplements the reference's read path (SURVEY.md §3.2-3.3):
query compile (``SearchBucket``) → per-segment scoring → k-way merge →
stored-field materialization (``encodeResults``), as vectorized numpy
posting-list algebra. Scoring is Lucene-8-default BM25 with exact doc
lengths (SURVEY.md §7.0):

    idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
    tfn  = tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))
    rank = score desc, doc_id asc        (SearchBucket.java:959-963)

Conjunctions use the block-max skip path: the rarest term is decoded
first and the other terms decode only posting blocks overlapping the
candidate doc range (block_last skip data ≈ Lucene skip lists / BMW).

Two execution modes share all logic:
- inline: the driver reads segments directly (tests, small indexes);
- actor pool: ``SegmentActor``s each own a segment subset and score
  terms locally (≈ ``SearcherManager`` per shard, ``Lucene.java:148``),
  so only (doc_id, score) arrays cross the object store.
"""

from __future__ import annotations

import fnmatch
import math
import re
import time
import os
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.index.docids import term_shard
from icat_lucene_ray.index.manifest import IndexManifest
from icat_lucene_ray.query.ast import (
    And, Boost, DisMax, Filter, Fuzzy, MatchAll, Not, Or, Phrase, Query,
    RangeFilter, Regexp, Term, Weight, Wildcard,
)
from icat_lucene_ray.query.segment import SegmentGroupReader


class SearchTimeout(Exception):
    """≈ the reference's TimeLimitingCollector cancellation
    (Lucene.java:1471-1515, HTTP 504)."""


@dataclass
class SearchResult:
    table: pa.Table
    total_hits: int
    search_after: dict | None = None


_EMPTY = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))


@dataclass(frozen=True)
class _Stem(Query):
    """Internal node: an already-analyzed (and field-prefixed) posting
    term — used so Phrase/expansion never round-trips a stem through the
    analyzer again (stemming is not guaranteed idempotent, and prefixed
    terms would re-split)."""
    stem: str


#: cap on the fuzzy DP's padded (Lmax, T) uint32 code matrix — its size
#: is T × the SINGLE longest term, so one pathological token (minified
#: JS, base64 blob) must not OOM the actor. Above the cap the cached
#: terms still serve wildcard/regexp; fuzzy keeps the streaming scan.
_TERM_CODES_MAX_BYTES = 512 << 20


def _regexp_lower(pattern: str) -> str:
    """Lowercase only a regexp's literal characters: ``\\D``/``\\S``/
    ``\\W``/``\\B`` are the COMPLEMENTS of their lowercase forms, so a
    blanket ``.lower()`` (M11) would invert their meaning. Escapes pass
    through untouched."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(c)
            out.append(pattern[i + 1])
            i += 2
        else:
            out.append(c.lower())
            i += 1
    return "".join(out)


def _levenshtein(a: str, b: str) -> int:
    """Scalar plain-Levenshtein for SHORT value lists (meta-column
    fuzzy expansion); the dictionary paths use the vectorized DPs."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _has_toplevel_alternation(pattern: str) -> bool:
    """True when an unescaped ``|`` sits at group depth 0 (outside any
    character class) — then NO leading literal is a guaranteed prefix
    of every match, so dictionary-range pruning must be skipped."""
    depth = 0
    in_cls = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_cls:
            if c == "]":
                in_cls = False
        elif c == "[":
            in_cls = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def _union_sum(parts: list[tuple[np.ndarray, np.ndarray]]):
    """Union doc sets, summing scores of duplicates (OR semantics)."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return _EMPTY
    if len(parts) == 1:
        return parts[0]
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(docs, return_inverse=True)
    out = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(out, inv, scores)
    return uniq, out


class Index:
    """Open an index directory for querying."""

    #: dense-mode predicate scans fan out to Ray tasks at/above this
    #: base-file count; below it the inline loop is cheaper than task
    #: dispatch
    scan_fanout_min_files = 5

    def __init__(self, root: str, *, use_actors: bool = False,
                 num_actors: int | None = None):
        import os

        self.manifest = IndexManifest.load(root)
        self.cfg = EngineConfig.from_dict(self.manifest.config)
        self.analyzer = get_analyzer(self.manifest.analyzer)
        self.N = self.manifest.num_docs
        self.avgdl = self.manifest.avgdl or 1.0
        m = self.manifest
        # M2 multi-field: posting terms are "{field}:{stem}" and BM25
        # normalizes by the FIELD's avgdl (per-field stats from phase B)
        self.text_fields = list(getattr(m, "text_fields", None) or [])
        self._multi = len(self.text_fields) > 1
        self.default_field = self.text_fields[0] if self.text_fields else None
        self._field_avgdl = {
            f: (s.get("avgdl") or 1.0)
            for f, s in (getattr(m, "field_stats", None) or {}).items()}
        self._paths = {s["seg_id"]: m.segment_path(s["seg_id"]) for s in m.segments}
        self._readers = SegmentGroupReader(self._paths, self.cfg.codec_block)

        # generations (commit points): base = gen 0; each committed delta
        # adds segment slices + optional tombstones. A tombstone of gen g
        # masks every SOURCE older than g (SURVEY.md §2.9 visibility).
        self._gen_readers: list[tuple[int, SegmentGroupReader]] = [
            (0, self._readers)]
        self._tomb: list[tuple[int, np.ndarray]] = []
        doc_root = m.doc_table_dir()
        self._implicit = (getattr(m, "id_assignment", "explicit") == "dense")
        if self._implicit:
            # dense ids: the manifest's id_files list IS the doc store in
            # id order; doc_id = prefix-sum base + row position
            base_files = [os.path.join(root, p) for p, _n in m.id_files]
            rows = np.array([n for _p, n in m.id_files], dtype=np.int64)
            self._bases = np.zeros(len(rows) + 1, dtype=np.int64)
            np.cumsum(rows, out=self._bases[1:])
        else:
            base_files = sorted(
                os.path.join(r, f)
                for top in os.listdir(doc_root)
                if not top.startswith("delta_")
                for r, _d, fs in os.walk(os.path.join(doc_root, top))
                for f in fs if f.endswith(".parquet")
            ) if os.path.isdir(doc_root) else []
        self._base_files = list(base_files)
        self._doc_sources: list[tuple[int, pads.Dataset]] = [
            (0, pads.dataset(base_files))]
        self._base_frags = (list(self._doc_sources[0][1].get_fragments())
                            if self._implicit else None)
        for d in m.deltas:
            if d.get("tombstones"):
                import pyarrow.parquet as _pq

                ids = _pq.read_table(
                    os.path.join(root, d["tombstones"]))["doc_id"] \
                    .to_numpy(zero_copy_only=False)
                self._tomb.append((d["gen"], np.sort(ids)))
            if d["segments"]:
                paths = {s["seg_id"]: m.delta_segment_path(d["gen"], s["seg_id"])
                         for s in d["segments"]}
                self._gen_readers.append(
                    (d["gen"], SegmentGroupReader(paths, self.cfg.codec_block)))
            if d.get("doc_dir"):
                self._doc_sources.append(
                    (d["gen"], pads.dataset(os.path.join(root, d["doc_dir"]))))
        self._tomb_after: dict[int, np.ndarray] = {}

        self._doc_ds = self._doc_sources[0][1]  # base source (schema access)
        self._all_docs: np.ndarray | None = None
        self._df_cache: dict[str, int] = {}
        self._actors = None
        if use_actors:
            self._init_actors(num_actors)

    # ---------------- generations / tombstones ------------------------
    def _tombstones_after(self, gen: int) -> np.ndarray:
        """Sorted ids tombstoned by any generation > ``gen``."""
        got = self._tomb_after.get(gen)
        if got is None:
            parts = [ids for g, ids in self._tomb if g > gen]
            got = (np.unique(np.concatenate(parts)) if parts
                   else np.empty(0, np.int64))
            self._tomb_after[gen] = got
        return got

    def _live_mask(self, gen: int, ids: np.ndarray) -> np.ndarray | None:
        """Boolean keep-mask for rows of source generation ``gen``
        (None = all live)."""
        dead = self._tombstones_after(gen)
        if not len(dead) or not len(ids):
            return None
        keep = ~np.isin(ids, dead)
        return None if keep.all() else keep

    def _base_table(self, cols: list[str], filter=None,
                    filter_cols: tuple = ()) -> pa.Table:
        """Base doc-store rows with doc_id attached. In dense-id mode the
        id is implicit (base + row), so predicates are applied AFTER the
        ids are attached (via an in-memory dataset wrap) and the columns
        the predicate touches must be scanned too; explicit mode pushes
        the filter into the parquet scan."""
        src = self._doc_sources[0][1]
        if not self._implicit:
            return src.to_table(columns=cols, filter=filter)
        scan_cols = [c for c in dict.fromkeys(list(cols) + list(filter_cols))
                     if c != "doc_id"]
        if filter is not None \
                and len(self._base_files) >= self.scan_fanout_min_files \
                and _ray_initialized():
            # predicate scans fan out one Ray task per file group (the
            # same shape as the field-sorted top-k path) — the driver
            # receives only matching rows, never runs the O(N) scan
            import ray

            files = self._base_files_with_bases()
            n = min(len(files), 32)
            groups = [files[i::n] for i in range(n)]
            refs = [_fragment_filter_scan.remote(g, scan_cols, cols, filter)
                    for g in groups]
            self._filter_scan_tasks = getattr(
                self, "_filter_scan_tasks", 0) + len(groups)
            parts = [t for t in ray.get(refs) if t is not None]
            return (pa.concat_tables(parts) if parts
                    else self._base_schema_table(cols))
        parts = []
        for i, frag in enumerate(self._base_frags):
            t = frag.to_table(columns=scan_cols)
            ids = np.arange(self._bases[i], self._bases[i] + t.num_rows)
            t = t.add_column(0, "doc_id", pa.array(ids, pa.int64()))
            if filter is not None:
                t = pads.dataset(t).to_table(filter=filter)
            if t.num_rows:
                parts.append(t.select(cols))
        return (pa.concat_tables(parts) if parts
                else self._base_schema_table(cols))

    def _base_schema_table(self, cols: list[str]) -> pa.Table:
        sch = self._doc_sources[0][1].schema
        arrays = {}
        for c in cols:
            typ = pa.int64() if c == "doc_id" and self._implicit \
                else sch.field(c).type
            arrays[c] = pa.array([], typ)
        return pa.table(arrays)

    def _doc_store_table(self, columns: list[str],
                         filter=None, filter_cols: tuple = ()) -> pa.Table:
        """Live doc-store rows (per-source tombstone masks applied).
        ``filter_cols`` names the columns the filter expression touches
        (needed by the dense-id scan path)."""
        cols = list(dict.fromkeys(["doc_id"] + columns))
        parts = []
        for gen, src in self._doc_sources:
            if gen == 0:
                t = self._base_table(cols, filter, filter_cols)
            else:
                t = src.to_table(columns=cols, filter=filter)
            if t.num_rows:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                keep = self._live_mask(gen, ids)
                if keep is not None:
                    t = t.filter(pa.array(keep))
            parts.append(t)
        return pa.concat_tables(parts)

    # ---------------- actor pool -------------------------------------
    def _facet_shard_specs(self) -> list[tuple]:
        """(sidecar_part|None, base_file, id_base|None) per base doc-store
        file. Dense mode maps sidecar parts positionally (write order ==
        id_files order); explicit mode reads meta columns from the base
        file directly (pruned scan — the part↔file mapping is not
        guaranteed there)."""
        from icat_lucene_ray.index.facets import SIDECAR_DIR

        sc_dir = os.path.join(self.manifest.root, SIDECAR_DIR)
        specs = []
        for i, (path, base) in enumerate(self._base_files_with_bases()):
            part = os.path.join(sc_dir, f"part_{i:05d}.parquet")
            ok = base is not None and os.path.exists(part)
            specs.append((part if ok else None, path, base))
        return specs

    def _init_actors(self, num_actors: int | None):
        import ray

        n = num_actors or min(len(self._paths), 8) or 1
        seg_ids = sorted(self._paths)
        groups = [seg_ids[i::n] for i in range(n)]
        shard_specs = self._facet_shard_specs()
        meta_cols = list(self.manifest.meta_cols or [])
        self._actor_of: dict[int, int] = {}
        self._actors = []
        for ai, grp in enumerate(groups):
            paths = {sid: self._paths[sid] for sid in grp}
            self._actors.append(SegmentActor.remote(
                paths, self.cfg.codec_block,
                facet_shards=shard_specs[ai::n], meta_cols=meta_cols))
            for sid in grp:
                self._actor_of[sid] = ai

    # ---------------- stats ------------------------------------------
    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    # ---------------- field resolution (M2) ----------------------------
    def _field_prefix(self, field: str | None) -> str:
        """Posting-term prefix for a query field ('' on single-field
        indexes). Unknown fields raise — mirroring the reference
        rejecting unmapped search fields (DocumentMapping.java:120-146)."""
        if not self._multi:
            return ""
        f = field or self.default_field
        if f not in self.text_fields:
            raise ValueError(
                f"unknown text field {f!r}; index has {self.text_fields}")
        return f + ":"

    def _term_stems(self, q) -> list[str]:
        """Analyzed + field-prefixed posting terms of a Term/Phrase."""
        pfx = self._field_prefix(q.field)
        texts = q.terms if isinstance(q, Phrase) else (q.text,)
        return [pfx + s for t in texts
                for s in self.analyzer.analyze_query_term(t)]

    def _phrase_groups(self, q) -> list[list[str]]:
        """Per-POSITION posting-term groups of a Phrase: one group per
        surviving raw query token, holding that token's stem plus its
        single-token synonym expansions — expansions share the position,
        mirroring the index-side graph (``candidate_expansion``), so a
        phrase over a synonym-class word matches docs carrying any class
        member (reference ``TestLucene.java:147-171`` phrase+synonym).
        Stopped tokens are dropped, keeping phrase-lite's
        adjacency-after-stop semantics. Multi-token synonym rules carry
        no positions and are excluded here (documented edge)."""
        pfx = self._field_prefix(q.field)
        groups: list[list[str]] = []
        twp = getattr(self.analyzer, "tokens_with_positions", None)
        for t in q.terms:
            if twp is not None:
                per: dict[int, list[str]] = {}
                for s, j in twp(t):
                    per.setdefault(j, []).append(pfx + s)
                groups.extend(per[j] for j in sorted(per))
            else:
                groups.extend([pfx + s]
                              for s in self.analyzer.analyze_query_term(t))
        return groups

    def _avgdl_of(self, stem: str) -> float:
        """Per-field avgdl (BM25 length normalization is per field on
        multi-field indexes, like Lucene per-field norms)."""
        if not self._multi:
            return self.avgdl
        return self._field_avgdl.get(stem.split(":", 1)[0], self.avgdl)

    def _slices(self, stem: str) -> list[tuple[int, int]]:
        """(seg_id, bucket) slices holding this term, in doc order."""
        S = self.manifest.num_segments
        base = term_shard(stem.encode("utf-8"), S)
        hot = self.manifest.hot_terms.get(stem)
        if hot:
            return [((base + j) % S, j) for j in range(hot["n_salt"])]
        return [(base, 0)]

    def term_df(self, stem: str) -> int:
        """df summed across generations. Like Lucene's docFreq, it still
        counts tombstoned docs until a merge (documented staleness)."""
        df = self._df_cache.get(stem)
        if df is None:
            hot = self.manifest.hot_terms.get(stem)
            if hot:
                df = hot["df"]  # kept exact across commits by IndexUpdater
            else:
                seg, bucket = self._slices(stem)[0]
                df = sum(rdr.df(seg, stem, bucket)
                         for _gen, rdr in self._gen_readers)
            self._df_cache[stem] = df
        return df

    def _df_lookup(self, stems: list[str]) -> np.ndarray:
        """Vectorized ``term_df`` for many stems at once: one cached
        (sorted terms, summed dfs) pair from the termstats sidecar
        (salted head terms carry PARTIAL per-bucket dfs — summing
        matches ``term_df`` exactly, verified against it in pytest) +
        a searchsorted probe. Falls back to per-stem ``term_df`` when
        deltas exist (the sidecar is base-generation only) or the
        vocabulary exceeds ``cfg.term_dict_cache_max`` (web-scale
        vocabularies must not be driver-materialized). Hits populate
        ``_df_cache`` so the follow-up search's per-stem calls are
        warm."""
        if not stems:
            return np.empty(0, np.int64)
        if len(self._gen_readers) > 1:
            return np.array([self.term_df(s) for s in stems], np.int64)
        cache = getattr(self, "_df_arrays", "unset")
        if cache == "unset":
            cache = None
            try:
                ds = pads.dataset(self.manifest.termstats_dir())
                if ds.count_rows() <= self.cfg.term_dict_cache_max:
                    t = ds.to_table(columns=["term", "df"])
                    df = t.group_by("term").aggregate([("df", "sum")])
                    terms = np.asarray(df["term"].to_pylist(), dtype=object)
                    sums = df["df_sum"].to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                    order = np.argsort(terms, kind="stable")
                    cache = (terms[order], sums[order])
            except (OSError, pa.ArrowInvalid, KeyError):
                pass
            self._df_arrays = cache
        if cache is None:
            return np.array([self.term_df(s) for s in stems], np.int64)
        terms, sums = cache
        arr = np.asarray(stems, dtype=object)
        pos = np.minimum(np.searchsorted(terms, arr),
                         max(len(terms) - 1, 0))
        hit = terms[pos] == arr if len(terms) else np.zeros(len(arr), bool)
        out = np.where(hit, sums[pos], 0).astype(np.int64)
        for s, d in zip(stems, out):
            self._df_cache.setdefault(s, int(d))
        return out

    # ---------------- scoring primitives -----------------------------
    def _score_stem(self, stem: str, doc_range=None):
        """(docs, scores) for one already-analyzed stem across slices.
        Slices are contiguous ascending doc ranges → concat stays sorted."""
        df = self.term_df(stem)
        if df == 0:
            return _EMPTY
        idf = self.idf(df)
        k1, b = self.cfg.k1, self.cfg.b
        avgdl = self._avgdl_of(stem)
        slices = self._slices(stem)
        parts = []
        if self._actors is not None:
            # actors own the base (gen-0) segments; delta generations are
            # small and scored inline
            import ray

            futs = [
                self._actors[self._actor_of[seg]].score_term.remote(
                    seg, stem, bucket, idf, k1, b, avgdl, doc_range)
                for seg, bucket in slices
                if seg in self._actor_of
            ]
            for p in ray.get(futs):
                if p is not None:
                    parts.append(self._mask_part(0, p))
            gen_readers = self._gen_readers[1:]
        else:
            gen_readers = self._gen_readers
        for gen, rdr in gen_readers:
            for seg, bucket in slices:
                got = rdr.score_term(
                    seg, stem, bucket, idf, k1, b, avgdl, doc_range)
                if got is not None:
                    parts.append(self._mask_part(gen, got))
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _EMPTY
        if len(parts) == 1:
            return parts[0]
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        if len(docs) > 1 and np.any(docs[1:] < docs[:-1]):  # safety net
            order = np.argsort(docs, kind="stable")
            docs, scores = docs[order], scores[order]
        return docs, scores

    def _mask_part(self, gen: int, part):
        docs, scores = part
        keep = self._live_mask(gen, docs)
        if keep is None:
            return part
        return docs[keep], scores[keep]

    def _eval_stems(self, stems: list[str], doc_range=None):
        return _union_sum([self._score_stem(s, doc_range) for s in stems])

    def _score_stem_for_docs(self, stem: str, cand: np.ndarray):
        """Score ``stem`` ONLY at the sorted candidate doc ids: decode
        just the posting blocks whose doc range covers a candidate
        (block_last skip data), then intersect — the skip-pointer AND
        read path. Exact same per-posting scores as a full decode."""
        df = self.term_df(stem)
        if df == 0 or not len(cand):
            return _EMPTY
        idf = self.idf(df)
        k1, b = self.cfg.k1, self.cfg.b
        avgdl = self._avgdl_of(stem)
        parts = []
        use_actors = self._actors is not None
        if use_actors:
            import ray
        for gen, grp in self._gen_readers:
            for seg, bucket in self._slices(stem):
                if use_actors and gen == 0:
                    ai = self._actor_of.get(seg)
                    if ai is None:
                        continue
                    actor = self._actors[ai]
                    meta = ray.get(actor.block_meta.remote(seg, stem, bucket))
                else:
                    r = grp.reader(seg)
                    meta = r.block_meta(stem, bucket) if r else None
                if meta is None:
                    continue
                block_last = meta[0].astype(np.int64)
                bsel = np.unique(np.searchsorted(block_last, cand))
                bsel = bsel[bsel < len(block_last)]
                if not len(bsel):
                    continue
                if use_actors and gen == 0:
                    ids, sc = ray.get(actor.score_blocks.remote(
                        seg, stem, bucket, idf, k1, b, avgdl, bsel))
                else:
                    ids, sc = grp.reader(seg).score_blocks(
                        stem, bucket, idf, k1, b, avgdl, bsel)
                if not len(ids):
                    continue
                pos = np.minimum(np.searchsorted(cand, ids), len(cand) - 1)
                keep = cand[pos] == ids
                if keep.any():
                    # per-generation tombstone mask: an updated doc's id is
                    # live (in cand) but its base-generation postings are not
                    parts.append(self._mask_part(gen, (ids[keep], sc[keep])))
        if not parts:
            return _EMPTY
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        if len(docs) > 1 and np.any(docs[1:] < docs[:-1]):
            order = np.argsort(docs, kind="stable")
            docs, scores = docs[order], scores[order]
        return docs, scores

    # ---------------- doc-store predicates ----------------------------
    def _doc_ids_where(self, expr, fields: tuple = ()) -> np.ndarray:
        t = self._doc_store_table(columns=["doc_id"], filter=expr,
                                  filter_cols=fields)
        return np.sort(t["doc_id"].to_numpy(zero_copy_only=False))

    def live_count(self) -> int:
        """Live doc count from manifest + tombstone arithmetic: dense
        base count minus in-range tombstones, plus live delta rows —
        O(deltas + tombstones), never an O(N) id materialization.
        (Explicit-id indexes fall back to the id scan.)"""
        if not self._implicit:
            return len(self.all_doc_ids())
        n_base = int(self._bases[-1])
        dead0 = self._tombstones_after(0)
        total = n_base - int(np.count_nonzero(dead0 < n_base))
        for gen, src in self._doc_sources[1:]:
            ids = src.to_table(columns=["doc_id"])["doc_id"] \
                .to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            total += len(ids) if keep is None else int(np.count_nonzero(keep))
        return total

    def _match_all_topk_ids(self, k: int, after: dict | None
                            ) -> np.ndarray | None:
        """First-k live doc ids ascending (the scored-MatchAll result
        order: constant score, doc_id tiebreak) WITHOUT materializing
        the id universe — O(k + tombstones + delta rows). None = not
        applicable (explicit-id index)."""
        if not self._implicit:
            return None
        start = int(after["doc_id"]) + 1 if after else 0
        n_base = int(self._bases[-1])
        dead = self._tombstones_after(0)
        dead = dead[(dead >= start) & (dead < n_base)]
        m = max(0, min(n_base - start, k + len(dead)))
        base_ids = np.arange(start, start + m, dtype=np.int64)
        if len(dead):
            base_ids = base_ids[~np.isin(base_ids, dead)]
        base_ids = base_ids[:k]
        extras = []
        for gen, src in self._doc_sources[1:]:
            ids = src.to_table(columns=["doc_id"])["doc_id"] \
                .to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            if keep is not None:
                ids = ids[keep]
            extras.append(ids[ids >= start])
        if extras and sum(len(e) for e in extras):
            base_ids = np.unique(np.concatenate([base_ids] + extras))[:k]
        return base_ids

    def all_doc_ids(self) -> np.ndarray:
        if self._all_docs is None:
            if self._implicit and len(self._doc_sources) == 1 \
                    and not self._tomb:
                self._all_docs = np.arange(int(self._bases[-1]))
            else:
                t = self._doc_store_table(columns=["doc_id"])
                self._all_docs = np.sort(
                    t["doc_id"].to_numpy(zero_copy_only=False))
        return self._all_docs

    def _doc_batches(self, scan_cols: list[str]):
        """Yield (gen, record_batch_with_doc_id) across all sources."""
        for gen, src in self._doc_sources:
            if gen == 0 and self._implicit:
                cols = [c for c in scan_cols if c != "doc_id"]
                for i, frag in enumerate(self._base_frags):
                    off = int(self._bases[i])
                    for b in frag.to_batches(columns=cols):
                        t = pa.Table.from_batches([b]).add_column(
                            0, "doc_id",
                            pa.array(np.arange(off, off + len(b)), pa.int64()))
                        off += len(b)
                        yield gen, t
            else:
                for b in src.to_batches(
                        columns=list(dict.fromkeys(["doc_id"] + scan_cols))):
                    yield gen, b

    @staticmethod
    def _filter_expr(q: Filter):
        f = pads.field(q.field_name)
        if len(q.values) == 0:
            return None  # MatchNoDocs (SearchBucket.java:830 empty IN-list)
        return f.isin(list(q.values))

    @staticmethod
    def _range_expr(q: RangeFilter):
        f = pads.field(q.field_name)
        parts = []
        if q.lo is not None:
            parts.append(f >= q.lo if q.include_lo else f > q.lo)
        if q.hi is not None:
            parts.append(f <= q.hi if q.include_hi else f < q.hi)
        if not parts:
            return None  # full range -> match all
        e = parts[0]
        for p in parts[1:]:
            e = e & p
        return e

    # ---------------- wildcard expansion ------------------------------
    # ---------------- in-memory term dictionary (cached) --------------
    def _term_cache(self):
        """Sorted unique term dictionary cached in memory, plus a padded
        (T, Lmax) uint32 code matrix for the fuzzy column-DP — built
        lazily on the first dictionary-expansion query and reused for
        the Index's lifetime (the Lucene analog: the FST term dict
        lives on the heap). Returns None (and caches the refusal) when
        the dictionary exceeds ``cfg.term_dict_cache_max`` — web-scale
        vocabularies keep the streaming parquet scan instead."""
        c = getattr(self, "_term_cache_v", "unset")
        if c != "unset":
            return c
        ds = pads.dataset(self.manifest.termstats_dir())
        n_rows = ds.count_rows()  # metadata-only upper bound (salt dups)
        if n_rows > self.cfg.term_dict_cache_max:
            self._term_cache_v = None
            return None
        col = ds.to_table(columns=["term"])["term"]
        terms = np.unique(np.asarray(col.to_pylist(), dtype=object))
        lens = np.array([len(t) for t in terms], dtype=np.int32)
        lmax = int(lens.max()) if len(lens) else 0
        if lmax * len(terms) * 4 > _TERM_CODES_MAX_BYTES:
            # padded matrix too big (one long token × many terms):
            # keep the sorted terms (wildcard/regexp stay in-memory),
            # leave fuzzy on the streaming scan
            self._term_cache_v = (terms, lens, None)
            return self._term_cache_v
        # TRANSPOSED (Lmax, T) layout: the fuzzy DP gathers one char
        # position across all active terms per step — row-contiguous
        codes = np.zeros((lmax, len(terms)), dtype=np.uint32)
        for i, t in enumerate(terms):
            codes[:lens[i], i] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32)
        self._term_cache_v = (terms, lens, codes)
        return self._term_cache_v

    @staticmethod
    def _prefix_range(terms: np.ndarray, prefix: str) -> tuple[int, int]:
        if not prefix:
            return 0, len(terms)
        lo = int(np.searchsorted(terms, prefix, side="left"))
        hi = int(np.searchsorted(terms, prefix + "\U0010ffff", side="left"))
        return lo, hi

    def expand_wildcard(self, pattern: str, field: str | None = None
                        ) -> list[str]:
        """Dictionary scan (term dictionary = termstats table). Pattern is
        lowercased first (M11, SearchBucket.java:171-194) — except for
        case-sensitive `.exact`-style indexes (path_hierarchy), exactly
        as the reference skips `.exact` fields in lowercaseWildcardQueries
        (SearchBucket.java:180-185); matching bypasses the analyzer as in
        Lucene wildcard queries. On multi-field indexes the pattern is
        matched within the target field's prefixed dictionary range.
        With the in-memory dictionary cache the match runs over cached
        terms (no parquet IO); above the cache cap it streams."""
        if self.manifest.analyzer != "path_hierarchy":
            pattern = pattern.lower()
        pattern = self._field_prefix(field) + pattern
        rx = re.compile(fnmatch.translate(pattern))
        prefix = pattern.split("*", 1)[0].split("?", 1)[0]
        cache = self._term_cache()
        if cache is not None:
            terms, _lens, _codes = cache
            lo, hi = self._prefix_range(terms, prefix)
            out = [t for t in terms[lo:hi] if rx.match(t)]
            return out[: self.cfg.max_wildcard_terms]
        ds = pads.dataset(self.manifest.termstats_dir())
        expr = None
        if prefix:
            # termstats is sorted by term -> row-group pruning via range
            hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
            expr = (pads.field("term") >= prefix) & (pads.field("term") < hi)
        seen: set[str] = set()  # salted terms appear once per slice
        out: list[str] = []
        for batch in ds.to_batches(columns=["term"], filter=expr):
            for t in batch["term"].to_pylist():
                if t not in seen and rx.match(t):
                    seen.add(t)
                    out.append(t)
                    if len(out) >= self.cfg.max_wildcard_terms:
                        return out
        return out

    def expand_regexp(self, pattern: str, field: str | None = None
                      ) -> list[str]:
        """Dictionary terms the regexp FULL-matches (Lucene RegexpQuery
        anchors the pattern to the entire term, ``RegExp`` grammar).
        Lowercased like wildcards (M11) except on case-sensitive
        ``.exact``-style indexes; a leading literal run of the pattern
        prunes the sorted dictionary's row groups exactly like the
        wildcard prefix."""
        if self.manifest.analyzer != "path_hierarchy":
            pattern = _regexp_lower(pattern)
        fp = self._field_prefix(field)
        try:
            rx = re.compile(pattern)
        except re.error as e:
            raise ValueError(f"bad regexp /{pattern}/: {e}")
        # leading literal chars (stop at any metacharacter; a literal
        # followed by a quantifier is not a guaranteed prefix, so back
        # off one char when the stop char is a quantifier; a TOP-LEVEL
        # alternation voids the prefix entirely — `en|de` matches terms
        # that share no prefix with `en`)
        lit = []
        if not _has_toplevel_alternation(pattern):
            meta = set("\\^$.|?*+()[]{}")
            for i, ch in enumerate(pattern):
                if ch in meta:
                    if ch in "?*{" and lit:
                        lit.pop()
                    break
                lit.append(ch)
        prefix = fp + "".join(lit)
        cache = self._term_cache()
        if cache is not None:
            terms, _lens, _codes = cache
            lo, hi = self._prefix_range(terms, prefix or fp)
            out = [t for t in terms[lo:hi]
                   if rx.fullmatch(t[len(fp):] if fp else t)]
            return out[: self.cfg.max_wildcard_terms]
        ds = pads.dataset(self.manifest.termstats_dir())
        expr = None
        if prefix:
            hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
            expr = (pads.field("term") >= prefix) & (pads.field("term") < hi)
        elif fp:
            hi = fp[:-1] + chr(ord(fp[-1]) + 1)
            expr = (pads.field("term") >= fp) & (pads.field("term") < hi)
        seen: set[str] = set()
        out: list[str] = []
        for batch in ds.to_batches(columns=["term"], filter=expr):
            for t in batch["term"].to_pylist():
                if t not in seen and rx.fullmatch(t[len(fp):] if fp else t):
                    seen.add(t)
                    out.append(t)
                    if len(out) >= self.cfg.max_wildcard_terms:
                        return out
        return out

    def _fuzzy_from_cache(self, cache, text: str, max_edits: int,
                          pref: str) -> list[str]:
        """Pruned column-wise Levenshtein DP over the cached sorted
        dictionary — the sorted-array equivalent of Lucene intersecting
        a Levenshtein automaton with the FST (FuzzyQuery): the DP
        advances one TERM character per step over all still-viable
        terms at once, dropping a term the moment its best row value
        exceeds ``max_edits`` (automaton dead state). Because sorted
        terms share prefixes, viability collapses after 2-3 characters
        and each step is one short vectorized pass — measured ~100×
        less work than the full banded DP scan on a 50k-term
        dictionary. Same PLAIN-Levenshtein metric as the scan path
        (bit-identical candidate sets, pytest-pinned)."""
        terms, lens, codes = cache
        lo, hi = self._prefix_range(terms, pref)
        if lo == hi:
            return []
        p0 = len(pref)
        qc = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        lq = len(qc)
        eff = lens[lo:hi].astype(np.int64) - p0
        # length band (same prefilter as the scan path)
        band = np.abs(eff - lq) <= max_edits
        active = lo + np.flatnonzero(band)
        if not len(active):
            return []
        # int8 rows halve DP memory traffic; distances are bounded by
        # the band (term len <= lq + e <= 127 here — longer query terms
        # take the int16 lane)
        dpt = np.int8 if lq + max_edits + 1 < 127 else np.int16
        dp = np.tile(np.arange(lq + 1, dtype=dpt), (len(active), 1))
        matches: list[np.ndarray] = []
        p = p0
        while len(active):
            done = lens[active] == p
            if done.any():
                ok = active[done & (dp[:, lq] <= max_edits)]
                if len(ok):
                    matches.append(ok)
                keep = ~done
                active, dp = active[keep], dp[keep]
                if not len(active):
                    break
            c = codes[p, active]  # row-contiguous gather (transposed)
            ndp = np.empty_like(dp)
            ndp[:, 0] = min(p - p0 + 1, 127)
            for j in range(1, lq + 1):
                sub = dp[:, j - 1] + (c != qc[j - 1])
                np.minimum(dp[:, j] + 1, ndp[:, j - 1] + 1, out=ndp[:, j])
                np.minimum(ndp[:, j], sub, out=ndp[:, j])
            dp = ndp
            keep = dp.min(axis=1) <= max_edits
            active, dp = active[keep], dp[keep]
            p += 1
        if not matches:
            return []
        idx = np.sort(np.concatenate(matches))
        return list(terms[idx[: self.cfg.max_wildcard_terms]])

    def expand_fuzzy(self, text: str, max_edits: int = 2,
                     field: str | None = None) -> list[str]:
        """Dictionary terms within ``max_edits`` PLAIN Levenshtein
        distance of ``text`` (lowercased like wildcards, M11; bypasses
        the analyzer as Lucene fuzzy terms do). The DP is vectorized
        over the candidate axis — one (n_cands,) numpy row per query
        char x candidate position, after a length-difference prefilter
        — so the dictionary scan stays batch-at-a-time. With the
        in-memory dictionary cache the pruned column-DP
        (:meth:`_fuzzy_from_cache`) answers without IO; above the
        cache cap the streaming scan below remains the scale path."""
        if self.manifest.analyzer != "path_hierarchy":
            text = text.lower()
        pref = self._field_prefix(field)
        cache = self._term_cache()
        if cache is not None and cache[2] is not None:
            return self._fuzzy_from_cache(cache, text, max_edits, pref)
        qc = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        ds = pads.dataset(self.manifest.termstats_dir())
        expr = None
        if pref:
            hi = pref[:-1] + chr(ord(pref[-1]) + 1)
            expr = (pads.field("term") >= pref) & (pads.field("term") < hi)
        seen: set[str] = set()
        out: list[str] = []
        for batch in ds.to_batches(columns=["term"], filter=expr):
            col = batch["term"]
            # Arrow-side length band: only |len - len(q)| <= max_edits
            # can match, and the Python string conversion below is the
            # scan's dominant cost on web-scale dictionaries
            ln = pc.utf8_length(col)
            lo = len(pref) + len(qc) - max_edits
            hi = len(pref) + len(qc) + max_edits
            m = pc.and_(pc.greater_equal(ln, lo), pc.less_equal(ln, hi))
            col = col.filter(m)
            if not len(col):
                continue
            terms = col.to_pylist()
            # strip the field prefix: lev(P+a, P+b) == lev(a, b)
            cand = [t[len(pref):] for t in terms] if pref else terms
            L = max(len(c) for c in cand)
            codes = np.zeros((len(cand), L), dtype=np.uint32)
            lens = np.empty(len(cand), dtype=np.int64)
            for i, c in enumerate(cand):
                lens[i] = len(c)
                codes[i, :len(c)] = np.frombuffer(
                    c.encode("utf-32-le"), dtype=np.uint32)
            prev = np.tile(np.arange(L + 1, dtype=np.int64),
                           (len(cand), 1))
            for ch in qc:
                cur = np.empty_like(prev)
                cur[:, 0] = prev[:, 0] + 1
                sub_cost = (codes != ch).astype(np.int64)
                for j in range(1, L + 1):
                    cur[:, j] = np.minimum(
                        np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                        prev[:, j - 1] + sub_cost[:, j - 1])
                prev = cur
            dist = prev[np.arange(len(cand)), lens]
            for t, ok in zip(terms, dist <= max_edits):
                # `seen` dedups salted terms (hot terms appear once per
                # slice in the dictionary)
                if ok and t not in seen:
                    seen.add(t)
                    out.append(t)
                    if len(out) >= self.cfg.max_wildcard_terms:
                        return out
        return out

    def _meta_distinct(self, name: str) -> list:
        """Distinct values of a stored meta column, cached per Index:
        one pruned single-column scan across the doc-store generations.
        This is the META column's "term dictionary" — Lucene runs
        wildcard/regexp/fuzzy on a StringField's own terms, so those
        nodes expand against these values, not the text dictionary.
        Values present only in tombstoned rows are harmless: the
        resulting Filter still respects tombstones at evaluation."""
        cache = getattr(self, "_meta_distinct_v", None)
        if cache is None:
            cache = self._meta_distinct_v = {}
        if name not in cache:
            vals: set = set()
            for _gen, src in self._doc_sources:
                for batch in src.to_batches(columns=[name]):
                    vals.update(pc.unique(batch[name]).to_pylist())
            vals.discard(None)
            cache[name] = sorted(vals, key=str)
        return cache[name]

    def _expand_meta_values(self, q: Query) -> tuple:
        """Meta-column values a Wildcard/Regexp/Fuzzy node matches —
        case-insensitive, mirroring M11's dictionary lowercasing (the
        text dictionary is already lowercase; meta values may not be)."""
        vals = self._meta_distinct(q.field)
        if isinstance(q, Wildcard):
            rx = re.compile(fnmatch.translate(q.pattern.lower()))
            return tuple(v for v in vals if rx.match(str(v).lower()))
        if isinstance(q, Regexp):
            try:
                rx = re.compile(_regexp_lower(q.pattern))
            except re.error as e:
                raise ValueError(f"bad regexp /{q.pattern}/: {e}")
            return tuple(v for v in vals if rx.fullmatch(str(v).lower()))
        probe = q.text.lower()
        return tuple(v for v in vals
                     if _levenshtein(str(v).lower(), probe) <= q.max_edits)

    def _rewrite_meta_fields(self, q: Query) -> Query:
        """Normalize field-scoped Term/Phrase nodes whose field is a
        stored META column into exact Filters (reference StringField
        semantics) BEFORE any fast path runs — the BM25 top-k shortcut
        and field-sorted paths never enter the recursive evaluator, so
        _eval's own routing can't cover them. Wildcard/Regexp/Fuzzy on
        a meta column expand against the column's distinct values (its
        "term dictionary") into the same exact Filters — an empty
        expansion is an empty IN-list, i.e. MatchNone. Unknown fields
        raise."""
        if isinstance(q, (Term, Phrase)) and q.field is not None \
                and q.field not in self.text_fields:
            if q.field in self.manifest.meta_cols:
                text = q.text if isinstance(q, Term) else " ".join(q.terms)
                return Filter(q.field, self._coerce_meta(q.field, text))
            raise ValueError(
                f"unknown query field {q.field!r}: text fields are "
                f"{self.text_fields}, filterable meta columns are "
                f"{list(self.manifest.meta_cols)}")
        if isinstance(q, (Wildcard, Regexp, Fuzzy)) and q.field is not None \
                and q.field not in self.text_fields:
            if q.field in self.manifest.meta_cols:
                return Filter(q.field, self._expand_meta_values(q))
            raise ValueError(
                f"unknown query field {q.field!r}: text fields are "
                f"{self.text_fields}, filterable meta columns are "
                f"{list(self.manifest.meta_cols)}")
        if isinstance(q, And):
            members = [self._rewrite_meta_fields(c) for c in q.clauses]
            extra = [m for m in members
                     if isinstance(m, (Filter, RangeFilter))]
            scored = [m for m in members
                      if not isinstance(m, (Filter, RangeFilter))]
            filters = [self._rewrite_meta_fields(f) for f in q.filters]
            return And(scored, filters=tuple(filters) + tuple(extra))
        if isinstance(q, Or):
            return Or([self._rewrite_meta_fields(c) for c in q.clauses],
                      min_should=q.min_should)
        if isinstance(q, DisMax):
            return DisMax([self._rewrite_meta_fields(c) for c in q.clauses],
                          tie=q.tie)
        if isinstance(q, Not):
            return Not(self._rewrite_meta_fields(q.positive),
                       self._rewrite_meta_fields(q.negative))
        if isinstance(q, Boost):
            return Boost(self._rewrite_meta_fields(q.required),
                         self._rewrite_meta_fields(q.optional))
        if isinstance(q, Weight):
            return Weight(self._rewrite_meta_fields(q.query), q.factor)
        return q

    def _coerce_meta(self, name: str, text: str):
        """Parse a query-string literal to the meta column's type."""
        t = self._doc_ds.schema.field(name).type
        try:
            if pa.types.is_integer(t):
                return int(text)
            if pa.types.is_floating(t):
                return float(text)
        except ValueError:
            raise ValueError(
                f"filter value {text!r} is not valid for numeric "
                f"column {name!r}")
        return text

    def _require_doc_field(self, name: str) -> None:
        """Clear error for filters on columns the doc store doesn't
        carry (otherwise Arrow raises a raw FieldRef error mid-scan)."""
        if name not in self._doc_ds.schema.names:
            have = [c for c in self._doc_ds.schema.names
                    if c not in ("terms", "tfs")]
            raise ValueError(
                f"filter field {name!r} is not a stored column of this "
                f"index (have: {', '.join(have)}); pass it via --meta / "
                "meta_cols at build time")

    # ---------------- evaluator ---------------------------------------
    def _check_deadline(self, deadline: float | None):
        if deadline is not None and time.monotonic() > deadline:
            raise SearchTimeout(f"exceeded {self.cfg.max_search_time_s}s")

    def _eval(self, q: Query, deadline=None, doc_range=None):
        """-> (docs sorted int64, scores float64 | None).
        ``scores is None`` marks a non-scoring (FILTER) result."""
        self._check_deadline(deadline)
        if isinstance(q, _Stem):
            return self._score_stem(q.stem, doc_range)
        if isinstance(q, (Term, Phrase)) and q.field is not None \
                and q.field not in self.text_fields:
            # field-scoped query on a NON-text field: stored meta
            # columns match exactly as non-scoring filters (reference
            # StringField semantics — meta fields are indexed verbatim,
            # not analyzed); anything else is an unmapped field and
            # raises, mirroring DocumentMapping's per-entity field
            # lists. Without this, a single-field index silently
            # DROPPED the field name and searched the text instead.
            if q.field in self.manifest.meta_cols:
                text = q.text if isinstance(q, Term) else " ".join(q.terms)
                return self._eval(
                    Filter(q.field, self._coerce_meta(q.field, text)),
                    deadline, doc_range)
            raise ValueError(
                f"unknown query field {q.field!r}: text fields are "
                f"{self.text_fields}, filterable meta columns are "
                f"{list(self.manifest.meta_cols)}")
        if isinstance(q, Term):
            stems = self._term_stems(q)
            return self._eval_stems(stems, doc_range) if stems else _EMPTY
        if isinstance(q, Phrase):
            if q.slop and not self.cfg.positions:
                raise ValueError(
                    "sloppy phrases need a positions index "
                    "(EngineConfig(positions=True)); the phrase-lite "
                    "profile has no positional streams to widen")
            if self.cfg.positions:
                groups = self._phrase_groups(q)
                if not groups:
                    return _EMPTY
                if len(groups) > 1:
                    return self._eval_phrase_positional(groups, deadline,
                                                        doc_range,
                                                        slop=q.slop)
                # one position: a SynonymQuery-style OR of its stems
                return self._eval_stems(groups[0], doc_range)
            stems = self._term_stems(q)
            if not stems:
                return _EMPTY
            # phrase-lite: conjunction of the analyzed terms (north_rule
            # default profile; positional profile is behind cfg.positions)
            return self._eval(And([_Stem(s) for s in stems]), deadline,
                              doc_range)
        if isinstance(q, Wildcard):
            stems = self.expand_wildcard(q.pattern, field=q.field)
            return self._eval_stems(stems, doc_range)
        if isinstance(q, Regexp):
            stems = self.expand_regexp(q.pattern, field=q.field)
            return self._eval_stems(stems, doc_range)
        if isinstance(q, Fuzzy):
            stems = self.expand_fuzzy(q.text, q.max_edits, field=q.field)
            return self._eval_stems(stems, doc_range)
        if isinstance(q, Weight):
            docs, sc = self._eval(q.query, deadline, doc_range)
            if sc is None:
                # Non-scoring subquery (Filter/RangeFilter/MatchAll):
                # Lucene's BoostQuery over a constant-score query yields
                # factor per match, so materialize the constant here —
                # otherwise Or() would substitute 1.0 and drop the boost.
                return docs, np.full(len(docs), q.factor)
            return docs, sc * q.factor
        if isinstance(q, MatchAll):
            docs = self.all_doc_ids()
            return docs, None
        if isinstance(q, Filter):
            self._require_doc_field(q.field_name)
            expr = self._filter_expr(q)
            if expr is None:
                return np.empty(0, np.int64), None
            return self._doc_ids_where(expr, (q.field_name,)), None
        if isinstance(q, RangeFilter):
            self._require_doc_field(q.field_name)
            expr = self._range_expr(q)
            docs = self.all_doc_ids() if expr is None else \
                self._doc_ids_where(expr, (q.field_name,))
            return docs, None
        if isinstance(q, Or):
            parts = [self._eval(c, deadline, doc_range) for c in q.clauses]
            scored = [(d, s if s is not None else np.ones(len(d))) for d, s in parts]
            if q.min_should <= 1:
                return _union_sum(scored)
            # minimumNumberShouldMatch: each clause's doc set is unique,
            # so per-doc clause count == per-doc occurrence count in the
            # concatenation; keep docs matching >= m clauses
            docs, scores = _union_sum(scored)
            if not len(docs):
                return _EMPTY
            alld = np.concatenate([d for d, _ in scored])
            counts = np.zeros(len(docs), np.int64)
            np.add.at(counts, np.searchsorted(docs, alld), 1)
            keep = counts >= q.min_should
            return docs[keep], scores[keep]
        if isinstance(q, DisMax):
            parts = [self._eval(c, deadline, doc_range) for c in q.clauses]
            scored = [(d, s if s is not None else np.ones(len(d)))
                      for d, s in parts if len(d)]
            if not scored:
                return _EMPTY
            docs, ssum = _union_sum(scored)
            smax = np.full(len(docs), -np.inf)
            for d, s in scored:
                np.maximum.at(smax, np.searchsorted(docs, d), s)
            return docs, smax + q.tie * (ssum - smax)
        if isinstance(q, Boost):
            # MUST + SHOULD: required constrains, optional only scores.
            # The optional side evaluates restricted to the required doc
            # range (block-skip window) — it can never widen the result.
            rd, rs = self._eval(q.required, deadline, doc_range)
            if not len(rd):
                return _EMPTY
            out = (np.zeros(len(rd)) if rs is None else rs.astype(np.float64,
                                                                  copy=True))
            od, osc = self._eval(q.optional, deadline,
                                 (int(rd[0]), int(rd[-1])))
            if len(od):
                if osc is None:
                    osc = np.ones(len(od))
                pos = np.minimum(np.searchsorted(rd, od), len(rd) - 1)
                hit = rd[pos] == od
                out[pos[hit]] += osc[hit]
            return rd, out
        if isinstance(q, Not):
            pdocs, pscores = self._eval(q.positive, deadline, doc_range)
            ndocs, _ = self._eval(q.negative, deadline)
            if len(ndocs) == 0 or len(pdocs) == 0:
                return pdocs, pscores
            keep = ~np.isin(pdocs, ndocs, assume_unique=True)
            return pdocs[keep], None if pscores is None else pscores[keep]
        if isinstance(q, And):
            return self._eval_and(q, deadline, doc_range)
        raise TypeError(f"unknown query node {type(q).__name__}")

    # ---------------- positional phrases (Q4) --------------------------
    def _eval_phrase_positional(self, groups: list[list[str]], deadline,
                                doc_range, slop: int = 0):
        """True phrase matching (reference ``TestLucene.java:147-171``
        semantics): the candidate set is the positions' conjunction (same
        block-skipped path as phrase-lite; a multi-stem position — a
        synonym class — contributes an OR clause), then the positional
        streams of the candidates verify adjacency — position i must
        hold SOME stem of group i at p+i for one common p (``slop`` > 0
        loosens this to the in-order window documented on
        :class:`Phrase`). Scores stay the BM25 sum of the member terms
        over the matching docs (documented divergence from Lucene's
        phrase-frequency scoring; SQL-oracle-expressible)."""
        docs, scores = self._eval(
            And([_Stem(g[0]) if len(g) == 1 else Or([_Stem(s) for s in g])
                 for g in groups]), deadline, doc_range)
        if not len(docs):
            return _EMPTY
        if scores is None:
            scores = np.ones(len(docs))
        keep = self._phrase_adjacency_mask(groups, docs) if slop == 0 \
            else self._phrase_sloppy_mask(groups, docs, slop)
        return docs[keep], scores[keep]

    def _term_positions(self, stem: str, cand: np.ndarray):
        """(doc_rep, positions) of every occurrence of ``stem`` within
        the sorted candidate doc set. With an actor pool, the decode +
        candidate intersection runs ON the segment actors — only the
        matching occurrence arrays cross the object store; tombstone
        masks apply per source generation either way."""
        parts_d: list[np.ndarray] = []
        parts_p: list[np.ndarray] = []
        use_actors = self._actors is not None
        if use_actors:
            import ray

            cand_ref = ray.put(cand)
            futs = []
            for seg, bucket in self._slices(stem):
                ai = self._actor_of.get(seg)
                if ai is not None:
                    futs.append(self._actors[ai].term_positions_for.remote(
                        seg, stem, bucket, cand_ref))
            for got in ray.get(futs):
                if got is not None:
                    d, p = got
                    keep = self._live_mask(0, d)
                    if keep is not None:
                        d, p = d[keep], p[keep]
                    if len(d):
                        parts_d.append(d)
                        parts_p.append(p)
        for gen, grp in (self._gen_readers[1:] if use_actors
                         else self._gen_readers):
            for seg, bucket in self._slices(stem):
                r = grp.reader(seg)
                if r is None:
                    continue
                got = r.term_positions_for(stem, bucket, cand)
                if got is None:
                    continue
                d, p = got
                keep = self._live_mask(gen, d)
                if keep is not None:
                    d, p = d[keep], p[keep]
                if len(d):
                    parts_d.append(d)
                    parts_p.append(p)
        if not parts_d:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(parts_d), np.concatenate(parts_p)

    def _group_positions(self, group: list[str], cand: np.ndarray):
        """Union of occurrence streams of a position's stem group (one
        stem, or a synonym class sharing the position)."""
        if len(group) == 1:
            return self._term_positions(group[0], cand)
        ds, ps = [], []
        for stem in group:
            d, p = self._term_positions(stem, cand)
            if len(d):
                ds.append(d)
                ps.append(p)
        if not ds:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(ds), np.concatenate(ps)

    def _phrase_adjacency_mask(self, groups: list[list[str]],
                               cand: np.ndarray) -> np.ndarray:
        """Boolean mask over ``cand``: a doc survives iff some position p
        has a stem of group i at p+i for every i (vectorized set
        intersection over (doc-rank, start-position) keys)."""
        occ = []
        max_pos = 0
        for group in groups:
            d, p = self._group_positions(group, cand)
            if not len(d):
                return np.zeros(len(cand), dtype=bool)
            occ.append((d, p))
            max_pos = max(max_pos, int(p.max()))
        M = max_pos + len(groups) + 2
        valid: np.ndarray | None = None
        for i, (d, p) in enumerate(occ):
            rank = np.searchsorted(cand, d)
            shifted = p - i
            ok = shifted >= 0
            keys = np.unique(rank[ok] * M + shifted[ok])
            valid = keys if valid is None else \
                valid[np.isin(valid, keys, assume_unique=True)]
            if not len(valid):
                return np.zeros(len(cand), dtype=bool)
        mask = np.zeros(len(cand), dtype=bool)
        mask[np.unique(valid // M)] = True
        return mask

    def _phrase_sloppy_mask(self, groups: list[list[str]],
                            cand: np.ndarray, slop: int) -> np.ndarray:
        """Boolean mask over ``cand`` for the IN-ORDER sloppy window
        (see :class:`Phrase`): per candidate doc, a greedy
        earliest-successor chain from each occurrence of group 0 finds
        the minimal window; accept when stretch <= slop. The candidate
        set is already the terms' conjunction, so the per-doc loop runs
        over few docs with short position lists."""
        n = len(groups)
        per_doc: list[dict[int, np.ndarray]] = []
        for group in groups:
            d, p = self._group_positions(group, cand)
            if not len(d):
                return np.zeros(len(cand), dtype=bool)
            order = np.lexsort((p, d))
            d, p = d[order], p[order]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            ends = np.append(starts[1:], len(d))
            per_doc.append({int(d[s]): p[s:e]
                            for s, e in zip(starts, ends)})
        mask = np.zeros(len(cand), dtype=bool)
        for ci, doc in enumerate(cand):
            lists = [per_doc[i].get(int(doc)) for i in range(n)]
            if any(ls is None for ls in lists):
                continue
            for a in lists[0]:
                q = int(a)
                ok = True
                for i in range(1, n):
                    nxt = lists[i]
                    j = int(np.searchsorted(nxt, q + 1))
                    if j == len(nxt):
                        ok = False
                        break
                    q = int(nxt[j])
                if ok and (q - int(a)) - (n - 1) <= slop:
                    mask[ci] = True
                    break
        return mask

    def _df_estimate(self, q: Query) -> int:
        """Cheap selectivity estimate for conjunction ordering."""
        if isinstance(q, _Stem):
            return self.term_df(q.stem)
        if isinstance(q, (Term, Phrase)) and q.field is not None \
                and q.field not in self.text_fields:
            return self.N  # meta-column filter in disguise: assume wide
        if isinstance(q, Term):
            stems = self._term_stems(q)
            return sum(self.term_df(s) for s in stems) if stems else 0
        if isinstance(q, Phrase):
            dfs = [self.term_df(s) for s in self._term_stems(q)]
            return min(dfs) if dfs else 0
        if isinstance(q, Boost):
            return self._df_estimate(q.required)
        return self.N  # filters / subtrees: assume wide

    def _eval_and(self, q: And, deadline, doc_range):
        clauses = list(q.clauses)
        filters = list(q.filters)
        if not clauses and not filters:
            return _EMPTY
        # rarest-first ordering, then progressive block-skipped intersection
        clauses.sort(key=self._df_estimate)
        cand: np.ndarray | None = None
        cand_scores: np.ndarray | None = None
        any_scored = False
        rng = doc_range
        for c in clauses:
            # skip-pointer path: once candidates exist, a single-stem
            # term clause decodes only the blocks covering them
            if cand is None:
                stems1 = None
            elif isinstance(c, _Stem):
                stems1 = [c.stem]
            elif isinstance(c, Term):
                stems1 = self._term_stems(c)
            else:
                stems1 = None
            if stems1 is not None and len(stems1) == 1:
                docs, scores = self._score_stem_for_docs(stems1[0], cand)
            else:
                docs, scores = self._eval(c, deadline, rng)
            if scores is None:
                scores = np.zeros(len(docs))
            else:
                any_scored = True
            if cand is None:
                cand, cand_scores = docs, scores
            else:
                keep = np.isin(cand, docs, assume_unique=True)
                cand = cand[keep]
                cand_scores = cand_scores[keep]
                pos = np.searchsorted(docs, cand)
                cand_scores = cand_scores + scores[pos]
            if len(cand) == 0:
                return _EMPTY
            rng = (int(cand[0]), int(cand[-1]))  # block-skip window
        for f in filters:
            docs, _ = self._eval(f, deadline, rng)
            if cand is None:
                # filter-only conjunction (Occur.FILTER-only trees,
                # SearchBucket.java:347-357): seed from the first filter
                cand, cand_scores = docs, np.zeros(len(docs))
            else:
                keep = np.isin(cand, docs, assume_unique=True)
                cand, cand_scores = cand[keep], cand_scores[keep]
            if len(cand) == 0:
                return _EMPTY
            rng = (int(cand[0]), int(cand[-1]))
        return cand, (cand_scores if any_scored else None)

    # ---------------- top-k / sort / pagination ------------------------
    @staticmethod
    def _topk_scored(docs, scores, k, after=None):
        if after is not None:
            s_a, d_a = float(after["score"]), int(after["doc_id"])
            m = (scores < s_a) | ((scores == s_a) & (docs > d_a))
            docs, scores = docs[m], scores[m]
        n = len(docs)
        if n > max(4 * k, 1024):
            thresh = np.partition(scores, n - k)[n - k] if k < n else -np.inf
            m = scores >= thresh
            docs, scores = docs[m], scores[m]
        order = np.lexsort((docs, -scores))[:k]
        return docs[order], scores[order]

    def _fetch_doc_rows(self, doc_ids: np.ndarray, columns: list[str]) -> pa.Table:
        if self._implicit and len(self._doc_sources) == 1 and not self._tomb:
            # dense ids double as row positions -> O(k) point lookups
            # that read only the touched row groups
            ids = np.asarray(doc_ids, dtype=np.int64)
            n_base = int(self._bases[-1])
            ids = ids[(ids >= 0) & (ids < n_base)]
            cols = [c for c in dict.fromkeys(["doc_id"] + columns)
                    if c != "doc_id"]
            t = self._doc_sources[0][1].take(pa.array(np.sort(ids)),
                                             columns=cols)
            return t.add_column(0, "doc_id",
                                pa.array(np.sort(ids), pa.int64()))
        expr = pads.field("doc_id").isin(pa.array(doc_ids))
        return self._doc_store_table(columns, filter=expr)

    def search_text(self, query_string: str, **kw) -> SearchResult:
        """Parse a free-text query string over the index's default field
        list and search (Q2 — the reference's one-call user surface,
        ``SearchBucket.java:217-298``)."""
        from icat_lucene_ray.query.parser import parse_query

        q = parse_query(query_string,
                        default_fields=(self.text_fields or None))
        return self.search(q, **kw)

    def search(
        self,
        q: Query,
        k: int = 10,
        *,
        sort: list[tuple[str, bool]] | None = None,  # (field, descending)
        fields: list[str] | None = None,
        search_after: dict | None = None,
        timeout: float | None = None,
        exact_total: bool = True,
        populate_scores: bool = False,
        collapse: str | None = None,
    ) -> SearchResult:
        """Top-k search. Relevance order (score desc, doc_id asc) by
        default; ``sort`` gives field-sorted top-k with doc_id tiebreak
        (K1/K2); ``search_after`` is the cursor from a previous result
        (K4, SearchBucket.java:892-949).

        ``exact_total=False`` allows MaxScore pruning for disjunctions:
        identical top-k, but ``total_hits`` becomes a LOWER BOUND (≈
        Lucene's TotalHits.Relation.GREATER_THAN_OR_EQUAL under WAND)."""
        deadline = time.monotonic() + (timeout or self.cfg.max_search_time_s)
        q = self._rewrite_meta_fields(q)
        if collapse is not None:
            if sort:
                raise ValueError("collapse does not combine with field "
                                 "sort (relevance order only)")
            return self._search_collapsed(q, k, collapse, fields,
                                          search_after, deadline)
        if sort:
            return self._search_field_sorted(
                q, k, sort, fields, search_after, deadline,
                populate_scores=populate_scores)
        if isinstance(q, MatchAll):
            # scored MatchAll: first-k live ids at constant score — no
            # O(N) arange of the id universe (dense-id indexes)
            self._check_deadline(deadline)
            ids = self._match_all_topk_ids(k, search_after)
            if ids is not None:
                tbl = pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "score": pa.array(np.ones(len(ids)), pa.float64())})
                if fields:
                    tbl = self._attach_fields(tbl, fields)
                cursor = ({"score": 1.0, "doc_id": int(ids[-1])}
                          if len(ids) else None)
                return SearchResult(tbl, self.live_count(), cursor)
        pruned = self._search_term_pruned(q, k, search_after, fields)
        if pruned is not None:
            return pruned
        if not exact_total:
            pruned = self._search_or_pruned(q, k, search_after, fields)
            if pruned is not None:
                return pruned
        docs, scores = self._eval(q, deadline)
        total = len(docs)
        if scores is None:
            scores = np.ones(len(docs))
        top_docs, top_scores = self._topk_scored(docs, scores, k, search_after)
        tbl = pa.table({"doc_id": pa.array(top_docs, pa.int64()),
                        "score": pa.array(top_scores, pa.float64())})
        if fields:
            tbl = self._attach_fields(tbl, fields)
        cursor = None
        if len(top_docs):
            cursor = {"score": float(top_scores[-1]), "doc_id": int(top_docs[-1])}
        return SearchResult(tbl, total, cursor)

    def _search_term_pruned(self, q: Query, k: int, after: dict | None,
                            fields: list[str] | None) -> SearchResult | None:
        """Block-max pruned top-k for single-stem term queries (the BMW
        read path): posting blocks are visited in descending
        ``idf × block_max`` bound order and decoding stops once the next
        bound cannot beat the current k-th score — exact top-k, decode
        cost ~O(k/B) blocks instead of df. Returns None when the query
        shape doesn't qualify (the general evaluator handles it)."""
        if not isinstance(q, Term):
            return None
        # tombstones make df/total unsafe; delta generations live outside
        # the base readers — both fall back to the general evaluator
        if self._tomb or len(self._gen_readers) > 1:
            return None
        stems = self._term_stems(q)
        if len(stems) != 1:
            return None
        stem = stems[0]
        avgdl = self._avgdl_of(stem)

        def _empty() -> SearchResult:
            tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                            "score": pa.array([], pa.float64())})
            if fields:
                tbl = self._attach_fields(tbl, fields)
            return SearchResult(tbl, 0, None)

        df = self.term_df(stem)
        if df == 0:
            return _empty()
        idf = self.idf(df)
        k1, b = self.cfg.k1, self.cfg.b

        # flat (slice_idx, block_idx) list ordered by descending bound;
        # slices resolve to inline readers or to segment actors (same
        # block protocol either way — only selected blocks are decoded,
        # and with actors only (ids, scores) cross the object store)
        per_slice = []
        bounds_all, sidx_all, bidx_all = [], [], []
        for si, (seg, bucket) in enumerate(self._slices(stem)):
            if self._actors is not None:
                import ray

                ai = self._actor_of.get(seg)
                if ai is None:
                    continue
                actor = self._actors[ai]
                meta = ray.get(actor.block_meta.remote(seg, stem, bucket))
                if meta is None:
                    continue

                def score_fn(blocks, *, actor=actor, seg=seg, bucket=bucket):
                    return ray.get(actor.score_blocks.remote(
                        seg, stem, bucket, idf, k1, b, avgdl, blocks))
            else:
                rdr = self._readers.reader(seg)
                meta = rdr.block_meta(stem, bucket) if rdr else None
                if meta is None:
                    continue

                def score_fn(blocks, *, rdr=rdr, bucket=bucket):
                    return rdr.score_blocks(
                        stem, bucket, idf, k1, b, avgdl, blocks)
            per_slice.append(score_fn)
            bmax = meta[1].astype(np.float64)
            bounds_all.append(idf * bmax)
            sidx_all.append(np.full(len(bmax), len(per_slice) - 1))
            bidx_all.append(np.arange(len(bmax)))
        if not per_slice:
            return _empty()
        bounds = np.concatenate(bounds_all)
        sidx = np.concatenate(sidx_all)
        bidx = np.concatenate(bidx_all)
        order = np.argsort(-bounds, kind="stable")
        # f32 storage of block_max can round below the true f64 max;
        # widen bounds by 2^-22 before comparing against theta
        EPS = 1.0 + 2.4e-7

        cand_d = np.empty(0, np.int64)
        cand_s = np.empty(0, np.float64)
        theta = -np.inf
        pos = 0
        chunk = max(4, -(-4 * k // self.cfg.codec_block) * 4)
        while pos < len(order):
            if len(cand_d) >= k and bounds[order[pos]] * EPS < theta:
                break
            take = order[pos:pos + chunk]
            pos += chunk
            if len(cand_d) >= k:
                take = take[bounds[take] * EPS >= theta]
                if len(take) == 0:
                    continue
            for si in np.unique(sidx[take]):
                ids, scores = per_slice[si](bidx[take[sidx[take] == si]])
                cand_d = np.concatenate([cand_d, ids])
                cand_s = np.concatenate([cand_s, scores])
            keep_d, keep_s = cand_d, cand_s
            if after is not None:
                s_a, d_a = float(after["score"]), int(after["doc_id"])
                m = (keep_s < s_a) | ((keep_s == s_a) & (keep_d > d_a))
                keep_d, keep_s = keep_d[m], keep_s[m]
            if len(keep_s) >= k:
                theta = np.partition(keep_s, len(keep_s) - k)[len(keep_s) - k]
        top_d, top_s = self._topk_scored(cand_d, cand_s, k, after)
        tbl = pa.table({"doc_id": pa.array(top_d, pa.int64()),
                        "score": pa.array(top_s, pa.float64())})
        if fields:
            tbl = self._attach_fields(tbl, fields)
        cursor = None
        if len(top_d):
            cursor = {"score": float(top_s[-1]), "doc_id": int(top_d[-1])}
        return SearchResult(tbl, df, cursor)

    # ---------------- MaxScore pruning for disjunctions (BMW-for-OR) ---
    def _or_stems(self, q: Query) -> list[str] | None:
        """Flat stem list if ``q`` is a pure disjunction of term-like
        clauses (Term / _Stem / nested Or); else None."""
        if isinstance(q, _Stem):
            return [q.stem]
        if isinstance(q, Term):
            return self._term_stems(q)
        if isinstance(q, Or):
            if q.min_should > 1:
                # minShouldMatch changes which docs qualify — the
                # MaxScore sum-of-terms bound no longer applies
                return None
            out: list[str] = []
            for c in q.clauses:
                sub = self._or_stems(c)
                if sub is None:
                    return None
                out += sub
            return out
        return None

    def _term_ubound(self, stem: str) -> float:
        """max tf_norm over the term's blocks (block_max metadata) —
        the term's max score is idf × this."""
        got = getattr(self, "_ubound_cache", None)
        if got is None:
            got = self._ubound_cache = {}
        u = got.get(stem)
        if u is None:
            u = 0.0
            for seg, bucket in self._slices(stem):
                if self._actors is not None:
                    import ray

                    ai = self._actor_of.get(seg)
                    meta = None if ai is None else ray.get(
                        self._actors[ai].block_meta.remote(seg, stem, bucket))
                else:
                    r = self._readers.reader(seg)
                    meta = r.block_meta(stem, bucket) if r else None
                if meta is not None and len(meta[1]):
                    u = max(u, float(meta[1].max()))
            got[stem] = u
        return u

    def _search_or_pruned(self, q: Query, k: int, after: dict | None,
                          fields: list[str] | None) -> SearchResult | None:
        """MaxScore / term-at-a-time WAND for disjunctions: terms are
        processed in descending max-score order; once the sum of the
        remaining terms' bounds cannot beat the current k-th score,
        the remaining (non-essential) terms decode ONLY the posting
        blocks covering existing candidates — exact top-k, but
        ``total_hits`` is a lower bound (docs only in pruned terms are
        never discovered). Reference-side Lucene applies WAND to all
        scored booleans; this is the OR extension of the single-term
        block-max path above."""
        if self._tomb or len(self._gen_readers) > 1:
            return None
        stems = self._or_stems(q)
        if stems is None:
            return None
        stems = list(dict.fromkeys(stems))
        if len(stems) < 2:
            return None
        infos = []
        for stem in stems:
            df = self.term_df(stem)
            if df == 0:
                continue
            infos.append((self.idf(df) * self._term_ubound(stem), stem))
        empty_tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
        if not infos:
            if fields:
                empty_tbl = self._attach_fields(empty_tbl, fields)
            return SearchResult(empty_tbl, 0, None)
        infos.sort(key=lambda x: -x[0])
        bounds = np.array([u for u, _ in infos])
        suffix = np.cumsum(bounds[::-1])[::-1]
        EPS = 1.0 + 2.4e-7  # f32 block_max widening (see single-term path)

        def _theta(docs, scores):
            s = scores
            if after is not None:
                s_a, d_a = float(after["score"]), int(after["doc_id"])
                m = (s < s_a) | ((s == s_a) & (docs > d_a))
                s = s[m]
            if len(s) < k:
                return -np.inf
            return float(np.partition(s, len(s) - k)[len(s) - k])

        cand_d, cand_s = _EMPTY
        theta = -np.inf
        rest = []
        for i, (_u, stem) in enumerate(infos):
            if len(cand_d) >= k and suffix[i] * EPS < theta:
                rest = infos[i:]
                break
            d, s = self._score_stem(stem)
            cand_d, cand_s = _union_sum([(cand_d, cand_s), (d, s)])
            theta = _theta(cand_d, cand_s)
        for _u, stem in rest:
            d2, s2 = self._score_stem_for_docs(stem, cand_d)
            if len(d2):
                pos = np.searchsorted(cand_d, d2)
                cand_s[pos] += s2
        top_d, top_s = self._topk_scored(cand_d, cand_s, k, after)
        tbl = pa.table({"doc_id": pa.array(top_d, pa.int64()),
                        "score": pa.array(top_s, pa.float64())})
        if fields:
            tbl = self._attach_fields(tbl, fields)
        cursor = None
        if len(top_d):
            cursor = {"score": float(top_s[-1]), "doc_id": int(top_d[-1])}
        return SearchResult(tbl, len(cand_d), cursor)

    def _attach_fields(self, tbl: pa.Table, fields: list[str]) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            empty = {f: pa.array([], self._doc_ds.schema.field(f).type) for f in fields}
            return pa.table({**{c: tbl[c] for c in tbl.column_names}, **empty})
        fetched = self._fetch_doc_rows(ids, fields)
        f_ids = fetched["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(f_ids)
        pos = order[np.searchsorted(f_ids[order], ids)]
        out = {c: tbl[c] for c in tbl.column_names}
        for f in fields:
            if f == "doc_id":
                continue
            out[f] = fetched[f].take(pa.array(pos))
        return pa.table(out)

    def _search_field_sorted(self, q, k, sort, fields, after,
                             deadline, populate_scores=False) -> SearchResult:
        """K2/K3 field-sorted top-k, distributed: one Ray task per base
        doc-store fragment group computes its LOCAL top-k over (sort
        keys, doc_id); the driver k-way-merges ≤ k rows per task plus an
        inline pass over the (small) delta stores — mirroring Lucene's
        per-shard collect + ``TopFieldDocs.merge`` (``Lucene.java:1506``).
        Nothing materializes the full candidate key set: a MatchAll sort
        over 10^12 docs moves k rows per fragment, not N."""
        import ray

        sort_cols = [f for f, _ in sort]
        if isinstance(q, MatchAll):
            cand = None  # match-all: no candidate set to ship
            total = len(self.all_doc_ids()) if (self._tomb or
                                                len(self._doc_sources) > 1) \
                else self.N
        else:
            docs, _ = self._eval(q, deadline)
            cand, total = docs, len(docs)
            if total == 0:
                tbl = self._attach_fields(
                    pa.table({"doc_id": pa.array([], pa.int64())}),
                    list(dict.fromkeys(sort_cols + (fields or []))))
                return SearchResult(tbl, 0, None)
        tomb = self._tombstones_after(0)
        parts: list[tuple[np.ndarray, list[np.ndarray]]] = []

        use_tasks = ray.is_initialized() and len(self._base_files) > 1
        if use_tasks:
            cand_ref = ray.put(cand)
            tomb_ref = ray.put(tomb if len(tomb) else None)
            files = self._base_files_with_bases()
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            ngroups = min(len(files), ncpu * 2)
            groups = [files[i::ngroups] for i in range(ngroups)]
            futs = [_fragment_field_topk.remote(
                g, sort, k, cand_ref, after, tomb_ref) for g in groups]
            for got in ray.get(futs):
                if got is not None:
                    parts.append(got)
        else:
            for path, base in self._base_files_with_bases():
                got = _fragment_topk_local([(path, base)], sort, k,
                                           cand, after,
                                           tomb if len(tomb) else None)
                if got is not None:
                    parts.append(got)
        # delta generations: small, scanned inline
        for gen, src in self._doc_sources[1:]:
            t = src.to_table(
                columns=list(dict.fromkeys(["doc_id"] + sort_cols)))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            if keep is not None:
                t = t.filter(pa.array(keep))
            got = _table_field_topk(t, sort, k, cand, after)
            if got is not None:
                parts.append(got)

        if not parts:
            tbl = self._attach_fields(
                pa.table({"doc_id": pa.array([], pa.int64())}),
                list(dict.fromkeys(sort_cols + (fields or []))))
            return SearchResult(tbl, total, None)
        ids = np.concatenate([p[0] for p in parts])
        keys = [np.concatenate([p[1][i] for p in parts])
                for i in range(len(sort))]
        order = _field_sort_order(keys, ids, sort)[:k]
        top_ids = ids[order]
        tbl = pa.table({"doc_id": pa.array(top_ids, pa.int64())})
        if populate_scores:
            # K6 populateScores (Lucene.java:1498-1500): relevance scores
            # for field-sorted hits, computed for the k result docs only
            sc = np.ones(len(top_ids))
            if len(top_ids) and not isinstance(q, MatchAll):
                d, s = self._eval(q, deadline,
                                  (int(top_ids.min()), int(top_ids.max())))
                if s is not None:
                    pos = np.minimum(np.searchsorted(d, top_ids),
                                     max(0, len(d) - 1))
                    hit = d[pos] == top_ids if len(d) else \
                        np.zeros(len(top_ids), bool)
                    sc = np.where(hit, s[pos] if len(d) else 0.0, 0.0)
            tbl = tbl.append_column("score", pa.array(sc, pa.float64()))
        out_fields = list(dict.fromkeys(sort_cols + (fields or [])))
        tbl = self._attach_fields(tbl, out_fields)
        cursor = None
        if len(top_ids):
            last = order[-1]
            vals = []
            for arr in keys:
                v = arr[last]
                vals.append(v.item() if hasattr(v, "item") else v)
            cursor = {"values": vals, "doc_id": int(top_ids[-1])}
        return SearchResult(tbl, total, cursor)

    def _search_collapsed(self, q, k, field, fields, after,
                          deadline) -> SearchResult:
        """Field-collapsed relevance top-k — Lucene grouping module
        semantics (``CollapsingTopDocsCollector`` / Elasticsearch
        ``collapse``): at most ONE hit per distinct value of a doc-store
        column (the best-scoring doc, doc_id-asc tiebreak), then
        relevance top-k over the per-key champions. ``total_hits``
        counts PRE-collapse matches (ES semantics). Distributed like
        the field-sorted path: one Ray task per base-fragment group
        returns ≤ (distinct keys in its fragments) rows — the full
        collapse-key column never lands on the driver. Docs with a NULL
        collapse key are excluded (documented divergence: Lucene groups
        them under a null bucket)."""
        import ray

        self._require_doc_field(field)

        def _empty(total: int) -> SearchResult:
            key_t = self._doc_ds.schema.field(field).type
            tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                            "score": pa.array([], pa.float64()),
                            field: pa.array([], key_t)})
            if fields:
                tbl = self._attach_fields(
                    tbl, [f for f in fields if f != field])
            return SearchResult(tbl, total, None)

        if isinstance(q, MatchAll):
            cand = cand_scores = None  # every live doc at score 1.0
            total = self.live_count()
        else:
            docs, scores = self._eval(q, deadline)
            if scores is None:
                scores = np.ones(len(docs))
            cand, cand_scores = docs, scores
            total = len(docs)
            if total == 0:
                return _empty(0)

        if cand is not None and len(cand) <= _AGG_INLINE_MAX:
            # small match set: cached facet-sidecar arrays (ST2-style)
            # for base-resident docs + point lookups for the delta rest
            # beat fragment fan-out by ~50x after the one-time load
            parts = self._inline_collapse_parts(cand, cand_scores, field)
            return self._finish_collapse(parts, field, fields, after,
                                         total, k, _empty)

        tomb = self._tombstones_after(0)
        parts = []
        use_tasks = ray.is_initialized() and len(self._base_files) > 1
        if use_tasks:
            cand_ref = ray.put(cand)
            sc_ref = ray.put(cand_scores)
            tomb_ref = ray.put(tomb if len(tomb) else None)
            files = self._base_files_with_bases()
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            ngroups = min(len(files), ncpu * 2)
            groups = [files[i::ngroups] for i in range(ngroups)]
            futs = [_fragment_collapse_best.remote(
                g, field, cand_ref, sc_ref, tomb_ref) for g in groups]
            for got in ray.get(futs):
                if got is not None:
                    parts.append(got)
        else:
            for path, base in self._base_files_with_bases():
                got = _fragment_collapse_local(
                    [(path, base)], field, cand, cand_scores,
                    tomb if len(tomb) else None)
                if got is not None:
                    parts.append(got)
        # delta generations: small, scanned inline
        for gen, src in self._doc_sources[1:]:
            t = src.to_table(columns=list(dict.fromkeys(["doc_id", field])))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            if keep is not None:
                t = t.filter(pa.array(keep))
            got = _table_collapse_best(t, field, cand, cand_scores)
            if got is not None:
                parts.append(got)
        return self._finish_collapse(parts, field, fields, after, total,
                                     k, _empty)

    def _sidecar_split(self, cand: np.ndarray):
        """Split a live candidate id set into (sidecar row positions,
        hit mask): base-generation rows resolvable through the cached
        facet sidecar. Ids tombstoned in the base (updated docs — their
        live row lives in a delta) are forced to MISS so callers fetch
        the fresh row instead of the stale base value."""
        st = self._facet_state_obj()
        sids = st.ids()
        if not len(sids) or not len(cand):
            return None, np.zeros(len(cand), bool)
        pos = np.minimum(np.searchsorted(sids, cand), len(sids) - 1)
        hit = sids[pos] == cand
        tomb = self._tombstones_after(0)
        if len(tomb):
            hit &= ~np.isin(cand, tomb)
        return pos, hit

    def _inline_collapse_parts(self, cand, cand_scores, field):
        """(keys, ids, scores) champion parts for a small candidate
        set — sidecar array lookups + delta point lookups."""
        st = self._facet_state_obj()
        pos, hit = self._sidecar_split(cand)
        parts = []
        kt = self._doc_ds.schema.field(field).type
        if hit.any():
            bi = pos[hit]
            ids_b, sc_b = cand[hit], cand_scores[hit]
            if (pa.types.is_string(kt) or pa.types.is_large_string(kt)
                    or pa.types.is_dictionary(kt)):
                codes, labels = st.string_dim(field)
                kv = codes[bi]
                ok = kv >= 0  # -1 = NULL key, excluded by contract
                if ok.any():
                    k_, i_, s_ = _best_per_key(kv[ok], ids_b[ok],
                                               sc_b[ok])
                    parts.append((np.array([labels[c] for c in k_],
                                           dtype=object), i_, s_))
            else:
                kv = np.asarray(st.numeric_dim(field))[bi]
                ok = ~np.isnan(kv) if kv.dtype.kind == "f" else \
                    np.ones(len(kv), bool)
                if ok.any():
                    k_, i_, s_ = _best_per_key(kv[ok], ids_b[ok],
                                               sc_b[ok])
                    if pa.types.is_timestamp(kt):
                        # match the dtype the parquet-read paths emit
                        k_ = k_.astype(np.int64).astype(
                            f"datetime64[{kt.unit}]")
                    parts.append((k_, i_, s_))
        missing = cand[~hit]
        if len(missing):
            t = self._fetch_doc_rows(missing, [field])
            got = _table_collapse_best(t, field, missing,
                                       cand_scores[~hit])
            if got is not None:
                parts.append(got)
        return parts

    def _inline_numeric_values(self, cand, field) -> np.ndarray:
        """float64 values of ``field`` for a small live candidate set
        (sidecar arrays + delta point lookups), NULLs dropped."""
        st = self._facet_state_obj()
        pos, hit = self._sidecar_split(cand)
        out = []
        if hit.any():
            v = np.asarray(st.numeric_dim(field))[pos[hit]].astype(
                np.float64)
            out.append(v[~np.isnan(v)])
        missing = cand[~hit]
        if len(missing):
            t = self._fetch_doc_rows(missing, [field])
            col = t[field]
            if col.null_count:
                col = col.drop_null()
            if len(col):
                out.append(col.to_numpy(
                    zero_copy_only=False).astype(np.float64))
        return np.concatenate(out) if out else np.empty(0)

    def _finish_collapse(self, parts, field, fields, after, total, k,
                         _empty) -> SearchResult:
        if not parts:
            return _empty(total)
        keys = np.concatenate([p[0] for p in parts])
        ids = np.concatenate([p[1] for p in parts])
        sc = np.concatenate([p[2] for p in parts])
        keys, ids, sc = _best_per_key(keys, ids, sc)
        if after is not None:
            s_a, d_a = float(after["score"]), int(after["doc_id"])
            m = (sc < s_a) | ((sc == s_a) & (ids > d_a))
            keys, ids, sc = keys[m], ids[m], sc[m]
        order = np.lexsort((ids, -sc))[:k]
        key_t = self._doc_ds.schema.field(field).type
        tbl = pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                        "score": pa.array(sc[order], pa.float64()),
                        field: pa.array(list(keys[order]), key_t)})
        if fields:
            tbl = self._attach_fields(tbl, [f for f in fields
                                            if f != field])
        cursor = None
        if len(order):
            cursor = {"score": float(sc[order][-1]),
                      "doc_id": int(ids[order][-1])}
        return SearchResult(tbl, total, cursor)

    def aggregate_stats(self, q: Query, field: str, *,
                        timeout: float | None = None) -> dict:
        """Metrics aggregation over the matching docs' numeric doc-store
        column — the Elasticsearch ``stats`` aggregation surface
        (Lucene's facets module exposes the same via
        ``DoubleRange``/value-source collectors): returns
        ``{count, sum, min, max, mean}`` with SQL aggregate NULL
        semantics (NULL values skipped; empty match -> count 0, None
        elsewhere). Distributed like collapse: one Ray task per
        base-fragment group returns a 4-number partial — only
        O(fragment groups) numbers reach the driver. Sums accumulate in
        float64 (exact for integer columns below 2^53); timestamp
        columns aggregate as epoch floats in their storage unit (the
        ES date-stats analog)."""
        import ray

        deadline = time.monotonic() + (timeout or self.cfg.max_search_time_s)
        q = self._rewrite_meta_fields(q)
        self._require_doc_field(field)
        if isinstance(q, MatchAll):
            cand = None
        else:
            cand, _ = self._eval(q, deadline)
            if not len(cand):
                return {"count": 0, "sum": None, "min": None,
                        "max": None, "mean": None}
        if cand is not None and len(cand) <= _AGG_INLINE_MAX:
            v = self._inline_numeric_values(cand, field)
            if not len(v):
                return {"count": 0, "sum": None, "min": None,
                        "max": None, "mean": None}
            s = float(v.sum())
            return {"count": len(v), "sum": s, "min": float(v.min()),
                    "max": float(v.max()), "mean": s / len(v)}
        tomb = self._tombstones_after(0)
        parts = []
        use_tasks = ray.is_initialized() and len(self._base_files) > 1
        if use_tasks:
            cand_ref = ray.put(cand)
            tomb_ref = ray.put(tomb if len(tomb) else None)
            files = self._base_files_with_bases()
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            ngroups = min(len(files), ncpu * 2)
            groups = [files[i::ngroups] for i in range(ngroups)]
            futs = [_fragment_stats.remote(g, field, cand_ref, tomb_ref)
                    for g in groups]
            parts += [g for g in ray.get(futs) if g is not None]
        else:
            for path, base in self._base_files_with_bases():
                got = _fragment_stats_local(
                    [(path, base)], field, cand,
                    tomb if len(tomb) else None)
                if got is not None:
                    parts.append(got)
        for gen, src in self._doc_sources[1:]:
            t = src.to_table(columns=list(dict.fromkeys(["doc_id", field])))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            if keep is not None:
                t = t.filter(pa.array(keep))
            got = _table_numeric_partial(t, field, cand)
            if got is not None:
                parts.append(got)
        merged = _merge_stats_partials(parts)
        if merged is None:
            return {"count": 0, "sum": None, "min": None,
                    "max": None, "mean": None}
        n, s, lo, hi = merged
        return {"count": int(n), "sum": s, "min": lo, "max": hi,
                "mean": s / n}

    def histogram(self, q: Query, field: str, interval: float, *,
                  offset: float = 0.0,
                  timeout: float | None = None) -> pa.Table:
        """Fixed-interval histogram aggregation over the matching docs'
        numeric column — the ES ``histogram`` / ``date_histogram``
        surface (Lucene exposes the same via the facets module's
        ``LongRange`` counts): rows ``(bucket, count)`` with ``bucket =
        floor((v - offset) / interval) * interval + offset`` (bucket's
        inclusive lower edge), empty buckets omitted, sorted ascending.
        Distributed like :meth:`aggregate_stats` — each fragment-group
        task returns a small {bucket -> count} dict, the driver merges
        O(groups × distinct buckets) entries."""
        import ray

        if not interval > 0:
            raise ValueError("interval must be > 0")
        deadline = time.monotonic() + (timeout or self.cfg.max_search_time_s)
        q = self._rewrite_meta_fields(q)
        self._require_doc_field(field)

        def _tbl(merged: dict) -> pa.Table:
            ks = np.array(sorted(merged), dtype=np.int64)
            return pa.table({
                "bucket": pa.array(ks.astype(np.float64) * interval
                                   + offset, pa.float64()),
                "count": pa.array([merged[int(k)] for k in ks],
                                  pa.int64()),
            })

        if isinstance(q, MatchAll):
            cand = None
        else:
            cand, _ = self._eval(q, deadline)
            if not len(cand):
                return _tbl({})
        if cand is not None and len(cand) <= _AGG_INLINE_MAX:
            v = self._inline_numeric_values(cand, field)
            if not len(v):
                return _tbl({})
            b = np.floor((v - offset) / interval).astype(np.int64)
            uniq, cnt = np.unique(b, return_counts=True)
            return _tbl(dict(zip(uniq.tolist(), cnt.tolist())))
        tomb = self._tombstones_after(0)
        merged: dict = {}

        def _fold(d):
            if d:
                for k, c in d.items():
                    merged[int(k)] = merged.get(int(k), 0) + int(c)

        use_tasks = ray.is_initialized() and len(self._base_files) > 1
        if use_tasks:
            cand_ref = ray.put(cand)
            tomb_ref = ray.put(tomb if len(tomb) else None)
            files = self._base_files_with_bases()
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            ngroups = min(len(files), ncpu * 2)
            groups = [files[i::ngroups] for i in range(ngroups)]
            futs = [_fragment_hist.remote(g, field, cand_ref, tomb_ref,
                                          interval, offset)
                    for g in groups]
            for got in ray.get(futs):
                _fold(got)
        else:
            for path, base in self._base_files_with_bases():
                _fold(_fragment_hist_local(
                    [(path, base)], field, cand,
                    tomb if len(tomb) else None, interval, offset))
        for gen, src in self._doc_sources[1:]:
            t = src.to_table(columns=list(dict.fromkeys(["doc_id", field])))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = self._live_mask(gen, ids)
            if keep is not None:
                t = t.filter(pa.array(keep))
            _fold(_table_hist_partial(t, field, cand, interval, offset))
        return _tbl(merged)

    def percentiles(self, q: Query, field: str,
                    qs: "list[float]" = (0.25, 0.5, 0.75, 0.95), *,
                    bins: int = 1024, cap: int = 100_000,
                    ) -> "dict[float, float]":
        """Percentiles aggregation over the matching docs' numeric
        doc-store column — the ES ``percentiles`` surface, but EXACT
        (``quantile_disc`` semantics: value at rank ``ceil(q*n)-1``)
        instead of t-digest-approximate. Composes
        :meth:`matches_dataset` (index-pruned streaming scan; pure
        predicates push into the scan tasks, scoring queries broadcast
        the match-id array once) with
        ``ops.stats.distributed_quantile`` (iterative histogram
        narrowing: multi-pass selection, O(bins) driver traffic per
        pass, all open quantiles sharing each scan — no sort, no
        shuffle, never O(matches) on the driver). Empty match ->
        ``{q: nan}``. Timestamp columns resolve as epoch floats in
        their storage unit (the ES ``percentiles`` over dates
        analog)."""
        from icat_lucene_ray.ops.stats import distributed_quantile

        self._require_doc_field(field)
        ds = self.matches_dataset(q, columns=[field]) \
                 .select_columns([field])
        return distributed_quantile(ds, field, list(qs), bins=bins,
                                    cap=cap)

    def cardinality(self, q: Query, field: str, *, exact: bool = False,
                    p: int = 14) -> float | int:
        """Cardinality aggregation over the matching docs' doc-store
        column — the ES ``cardinality`` surface. Default is the scale
        path: a one-pass HyperLogLog over :meth:`matches_dataset`
        (each batch reduces to a 2^p-byte register array, driver folds
        by elementwise max — no shuffle, ~0.8% relative error at
        p=14). ``exact=True`` runs the exact distinct count instead
        (one ``groupby(field)`` shuffle — fine when the match set or
        the key space is modest; at 10^12 docs prefer the sketch)."""
        from icat_lucene_ray.ops.stats import hll_distinct

        self._require_doc_field(field)
        ds = self.matches_dataset(q, columns=[field]) \
                 .select_columns([field])
        if exact:
            return int(ds.groupby(field).count().count())
        return hll_distinct(ds, field, p=p)

    def _base_files_with_bases(self) -> list[tuple[str, int | None]]:
        """Base doc-store files; dense-id mode pairs each with its id
        base (doc_id = base + row), explicit mode pairs with None."""
        if self._implicit:
            return [(f, int(self._bases[i]))
                    for i, f in enumerate(self._base_files)]
        return [(f, None) for f in self._base_files]

    # ---------------- highlight / suggest ------------------------------
    def _highlight_stems(self, q: Query, field: str | None) -> set[str]:
        """Scoring stems of ``q`` targeting ``field`` (None = any text
        field): Term and Phrase words, through boosts/booleans and the
        positive side of NOT. Non-analyzed nodes (Filter/Range/Wildcard/
        Regexp/Fuzzy) contribute nothing — matching Lucene's default
        highlighter, which marks only the query's analyzed terms."""
        out: set[str] = set()
        if isinstance(q, (Term, Phrase)):
            if field is None or q.field in (None, field):
                texts = q.terms if isinstance(q, Phrase) else (q.text,)
                for t in texts:
                    out.update(self.analyzer.analyze_query_term(t))
        elif isinstance(q, And):
            for c in q.clauses:
                out |= self._highlight_stems(c, field)
        elif isinstance(q, (Or, DisMax)):
            for c in q.clauses:
                out |= self._highlight_stems(c, field)
        elif isinstance(q, Not):
            out |= self._highlight_stems(q.positive, field)
        elif isinstance(q, Boost):
            out |= self._highlight_stems(q.required, field)
            out |= self._highlight_stems(q.optional, field)
        elif isinstance(q, Weight):
            out |= self._highlight_stems(q.query, field)
        return out

    def highlight(self, q: Query, k: int = 10, *, window: int = 5,
                  pre: str = "<em>", post: str = "</em>",
                  text_col: str | None = None,
                  source: str | None = None,
                  source_id_col: str = "doc_id",
                  **search_kwargs) -> pa.Table:
        """Top-k search + one highlighted fragment per hit.

        The fragment is token-based and deterministic (so an independent
        SQL oracle can recompute it): surface tokens are the analyzer's
        ``raw_tokens``; the anchor is the FIRST surface token whose
        analyzed stems intersect the query's scoring stems; the fragment
        is the ``window`` tokens either side of the anchor joined with
        single spaces, every matching token in it wrapped ``pre``/``post``.
        Hits whose stored text contains no scoring stem (pure-filter
        matches) get an empty snippet. Driver-side cost is O(k) stored
        docs — the search itself is the distributed part.

        Text source: the doc store when ``text_col`` is stored there;
        otherwise ``source`` names the original parquet table and the
        top-k texts are fetched by id through a pruned predicate scan
        (the index stores the analyzed form only — the raw corpus is
        the engine's external stored-field store, so the fetch is k
        point lookups, never a corpus scan). The reference has no
        highlighter (it encodes stored fields only, ``encodeResult``
        Lucene.java:854-903); this follows Lucene's UnifiedHighlighter
        contract (analyzed-term marking) as the natural user surface a
        search engine owes."""
        if text_col is None:
            text_col = ("text" if "text" in self._doc_ds.schema.names
                        else (self.default_field or "text"))
        if text_col in self._doc_ds.schema.names:
            res = self.search(q, k, fields=[text_col], **search_kwargs)
            texts = res.table[text_col].to_pylist()
        else:
            if source is None:
                raise ValueError(
                    f"text column {text_col!r} is not stored in the doc "
                    "store; pass source=<path of the original table> to "
                    "fetch snippets from it")
            res = self.search(q, k, **search_kwargs)
            ids = res.table["doc_id"].to_pylist()
            texts = self._texts_from_source(ids, text_col, source,
                                            source_id_col)
        stems = self._highlight_stems(self._rewrite_meta_fields(q), None)
        an = self.analyzer
        snippets: list[str] = []
        for text in texts:
            raws = an.raw_tokens(text or "")
            hit = [bool(stems.intersection(an.candidate_expansion(r)[0]))
                   for r in raws]
            try:
                i = hit.index(True)
            except ValueError:
                snippets.append("")
                continue
            lo, hi = max(0, i - window), min(len(raws), i + window + 1)
            frag = [pre + r + post if hit[j] else r
                    for j, r in enumerate(raws[lo:hi], start=lo)]
            snippets.append(" ".join(frag))
        return pa.table({
            "doc_id": res.table["doc_id"],
            "score": res.table["score"],
            "snippet": pa.array(snippets, pa.string())})

    def suggest(self, text: str, k: int = 5, *, max_edits: int = 2,
                field: str | None = None) -> pa.Table:
        """Spell suggestions: dictionary terms within ``max_edits`` PLAIN
        Levenshtein distance of ``text`` (the fuzzy expansion set, M11
        lowercasing), excluding an exact match, ranked by (distance asc,
        doc frequency desc, term asc) — Lucene DirectSpellChecker's
        default comparator shape. Returns (term, dist, df)."""
        pref = self._field_prefix(field)
        probe = (text if self.manifest.analyzer == "path_hierarchy"
                 else text.lower())
        rows = []
        for t in self.expand_fuzzy(text, max_edits, field):
            base = t[len(pref):] if pref else t
            d = _levenshtein(probe, base)
            if d == 0:
                continue
            rows.append((d, -self.term_df(t), base))
        rows.sort()
        rows = rows[:k]
        return pa.table({
            "term": pa.array([r[2] for r in rows], pa.string()),
            "dist": pa.array([r[0] for r in rows], pa.int64()),
            "df": pa.array([-r[1] for r in rows], pa.int64())})

    # ---------------- more-like-this / export ---------------------------
    def _resolve_text_col(self, text_col: str | None) -> str:
        if text_col is not None:
            return text_col
        return ("text" if "text" in self._doc_ds.schema.names
                else (self.default_field or "text"))

    def _texts_from_source(self, ids: list, text_col: str, source: str,
                           source_id_col: str) -> list[str]:
        """Fetch raw texts by id from the EXTERNAL stored-field table (a
        pruned predicate scan — len(ids) point lookups, never a corpus
        scan)."""
        t = pads.dataset(source).to_table(
            columns=[source_id_col, text_col],
            filter=pads.field(source_id_col).isin(ids))
        by_id = dict(zip(t[source_id_col].to_pylist(),
                         t[text_col].to_pylist()))
        return [by_id.get(i, "") for i in ids]

    def _stored_term_freqs(self, doc_id) -> dict[str, int] | None:
        """Per-doc analyzed term frequencies straight from the doc
        store's (terms, tfs) columns — term vectors without re-analysis
        or raw text. None when the store doesn't keep the analyzed form
        (or the index is multi-field, where the stored stream mixes
        fields)."""
        names = self._doc_ds.schema.names
        if self._multi or "terms" not in names or "tfs" not in names:
            return None
        t = self._fetch_doc_rows(np.asarray([doc_id], np.int64),
                                 ["terms", "tfs"])
        if not t.num_rows:
            return {}
        return dict(zip(t["terms"][0].as_py(), t["tfs"][0].as_py()))

    def mlt_terms(self, doc_id, *, max_query_terms: int = 10,
                  min_term_freq: int = 1, min_doc_freq: int = 1,
                  field: str | None = None, text_col: str | None = None,
                  source: str | None = None,
                  source_id_col: str = "doc_id") -> list[str]:
        """Representative terms of one document for more-like-this:
        analyzed stems with tf >= ``min_term_freq`` and dictionary df >=
        ``min_doc_freq``, ranked by tf × BM25-idf desc (term asc
        tiebreak), top ``max_query_terms`` — Lucene MoreLikeThis's
        interesting-term selection with its TF.IDF heuristic, made
        deterministic so a SQL oracle can recompute the exact set.

        Term source: the doc store's stored (terms, tfs) stream when
        present (Lucene term vectors — no raw text needed); otherwise
        the document text is re-analyzed, fetched from the doc store or
        from ``source``."""
        freqs = self._stored_term_freqs(doc_id)
        if freqs is None:
            text_col = self._resolve_text_col(text_col)
            if text_col in self._doc_ds.schema.names:
                t = self._fetch_doc_rows(np.asarray([doc_id], np.int64),
                                         [text_col])
                text = t[text_col][0].as_py() if t.num_rows else ""
            elif source is None:
                raise ValueError(
                    f"neither analyzed (terms, tfs) nor text column "
                    f"{text_col!r} is stored in the doc store; pass "
                    "source=<path of the original table> to read the "
                    "document text from it")
            else:
                text = self._texts_from_source([doc_id], text_col, source,
                                               source_id_col)[0]
            freqs = self.analyzer.term_freqs(text or "")
        pref = self._field_prefix(field)
        stems = [s for s, tf in freqs.items() if tf >= min_term_freq]
        dfs = self._df_lookup([pref + s for s in stems])
        cands: list[tuple[float, str]] = []
        for stem, df in zip(stems, dfs):
            if df <= 0 or df < min_doc_freq:
                continue
            cands.append((-(freqs[stem] * self.idf(int(df))), stem))
        cands.sort()
        return [s for _, s in cands[:max_query_terms]]

    def more_like_this(self, doc_id, k: int = 10, *,
                       max_query_terms: int = 10, min_term_freq: int = 1,
                       min_doc_freq: int = 1, field: str | None = None,
                       text_col: str | None = None,
                       source: str | None = None,
                       source_id_col: str = "doc_id",
                       **search_kwargs) -> SearchResult:
        """Find documents similar to ``doc_id``: its ``mlt_terms`` become
        a BM25 disjunction (the MaxScore-pruned OR path) and the source
        document itself is dropped from the hits. ``total_hits`` counts
        the source document when it matches its own terms — Lucene
        MoreLikeThis has the same property. The reference exposes no MLT
        endpoint (Lucene.java wraps search/facet only); this follows
        ``org.apache.lucene.queries.mlt.MoreLikeThis`` as the natural
        companion surface."""
        terms = self.mlt_terms(
            doc_id, max_query_terms=max_query_terms,
            min_term_freq=min_term_freq, min_doc_freq=min_doc_freq,
            field=field, text_col=text_col, source=source,
            source_id_col=source_id_col)
        if not terms:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
            return SearchResult(empty, 0, None)
        pref = self._field_prefix(field)
        q = Or([_Stem(pref + s) for s in terms])
        # MLT totals are uninteresting (Lucene MLT makes no total
        # promise either), so default to the MaxScore-pruned OR path —
        # identical top-k, total_hits becomes a lower bound
        search_kwargs.setdefault("exact_total", False)
        res = self.search(q, k + 1, **search_kwargs)
        t = res.table.filter(
            pc.not_equal(res.table["doc_id"], pa.scalar(doc_id))).slice(0, k)
        cursor = None
        if t.num_rows:
            cursor = {"score": float(t["score"][t.num_rows - 1].as_py()),
                      "doc_id": int(t["doc_id"][t.num_rows - 1].as_py())}
        return SearchResult(t, res.total_hits, cursor)

    def _as_pushdown_expr(self, q: Query, cols: set[str]):
        """Arrow dataset expression when ``q`` is a pure non-scoring
        predicate over stored columns (Filter / RangeFilter /
        And-of-those / MatchAll) — the export fast path that never
        materializes a match set on the driver. Returns True (match
        all), False (provably empty), an Expression (touched column
        names accumulate into ``cols``), or None (needs the index)."""
        if isinstance(q, MatchAll):
            return True
        if isinstance(q, Filter):
            self._require_doc_field(q.field_name)
            e = self._filter_expr(q)
            if e is None:
                return False
            cols.add(q.field_name)
            return e
        if isinstance(q, RangeFilter):
            self._require_doc_field(q.field_name)
            e = self._range_expr(q)
            if e is None:
                return True
            cols.add(q.field_name)
            return e
        if isinstance(q, And):
            # And carries FILTER context in a separate tuple (the
            # reference's BooleanClause.Occur.FILTER); both sides must
            # be pure predicates
            parts = [self._as_pushdown_expr(c, cols)
                     for c in (*q.clauses, *q.filters)]
            if any(p is None for p in parts):
                return None
            if any(p is False for p in parts):
                return False
            exprs = [p for p in parts if p is not True]
            if not exprs:
                return True
            out = exprs[0]
            for p in exprs[1:]:
                out = out & p
            return out
        return None

    def matches_dataset(self, q: Query, *,
                        columns: list[str] | None = None,
                        with_score: bool = False) -> "object":
        """ALL matching live documents as a streaming
        ``ray.data.Dataset`` — the bridge from index to pipeline (an
        index-accelerated corpus selection feeding downstream
        ``map_batches`` stages; ≈ Elasticsearch scroll, which Lucene
        users reach for when top-k is not enough).

        Execution: one Ray Data task per doc-store file. Pure predicate
        queries (Filter / RangeFilter / And of those / MatchAll) never
        touch the index or the driver — the expression is applied inside
        each scan task. Scoring/text queries evaluate on the index first
        and broadcast the sorted match-id array once (``ray.put``); each
        task keeps only its rows via searchsorted membership, and
        dense-id file ranges outside the match span are pruned before
        any task is launched. Driver memory is O(matches) only on the
        index path — selective by construction (a match-all export takes
        the predicate path). Updated/deleted docs are masked per source
        generation exactly like ``_doc_store_table``."""
        import ray
        import ray.data as rd

        q = self._rewrite_meta_fields(q)
        base_names = list(self._doc_ds.schema.names)
        if self._implicit and "doc_id" not in base_names:
            base_names = ["doc_id"] + base_names
        if columns is None:
            columns = [c for c in base_names if c != "doc_id"]
        for c in columns:
            if c not in base_names:
                raise ValueError(
                    f"column {c!r} is not stored in the doc store; "
                    f"stored columns are {base_names}")
        out_cols = list(dict.fromkeys(["doc_id"] + columns))

        expr_cols: set[str] = set()
        expr = self._as_pushdown_expr(q, expr_cols)
        ids = scores = None
        if expr is None:  # needs the index: match ids, broadcast once
            ids, scores = self._eval(q)
            if with_score and scores is None:
                scores = np.ones(len(ids), np.float64)
            expr = True
        elif with_score:
            scores = None  # constant 1.0 per match, attached in-task

        # output schema (stable even when no task emits rows)
        sch = self._doc_ds.schema
        fields = []
        for c in out_cols:
            if c == "doc_id" and self._implicit:
                fields.append(pa.field("doc_id", pa.int64()))
            else:
                fields.append(pa.field(c, sch.field(c).type))
        if with_score:
            fields.append(pa.field("score", pa.float64()))
        out_schema = pa.schema(fields)

        if expr is False or (ids is not None and len(ids) == 0):
            return rd.from_arrow(out_schema.empty_table())

        specs = []
        lo = int(ids[0]) if ids is not None and len(ids) else None
        hi = int(ids[-1]) if ids is not None and len(ids) else None
        for i, (path, base) in enumerate(self._base_files_with_bases()):
            if base is not None and ids is not None:
                n = int(self._bases[i + 1] - self._bases[i])
                if base + n <= lo or base > hi:
                    continue  # dense range disjoint from the match span
            specs.append({"path": path,
                          "base": -1 if base is None else int(base),
                          "gen": 0})
        for gen, src in self._doc_sources[1:]:
            for f in src.files:
                specs.append({"path": f, "base": -1, "gen": int(gen)})
        if not specs:
            return rd.from_arrow(out_schema.empty_table())

        tombs = {int(gen): self._tombstones_after(gen)
                 for gen, _src in self._doc_sources}
        fn_kwargs = {
            "ids_ref": ray.put(ids) if ids is not None else None,
            "sc_ref": ray.put(scores) if scores is not None else None,
            "tomb_ref": ray.put(tombs),
            "expr": expr if expr is not True else None,
            "scan_cols": sorted(set(out_cols) | expr_cols),
            "out_cols": out_cols,
            "with_score": with_score,
            "schema": out_schema,
        }
        return rd.from_items(specs, override_num_blocks=len(specs)) \
            .map_batches(_export_scan_batch, batch_size=None,
                         batch_format="pandas", fn_kwargs=fn_kwargs)

    # ---------------- counting / facets --------------------------------
    def count(self, q: Query) -> int:
        if isinstance(q, MatchAll):
            return self.live_count()  # A7 without the O(N) arange
        docs, _ = self._eval(self._rewrite_meta_fields(q))
        return len(docs)

    def facets(
        self,
        q: Query,
        dims: list[str] | None = None,
        ranges: dict[str, list[tuple[str, float, float]]] | None = None,
        max_labels: int = 10,
    ) -> dict:
        """String facet counts (A1) / sparse all-dims (A2) / numeric range
        facets (A3), merged across sources (A4). Output shape ≈
        FacetedDimension.buildResponse (A5).

        Base (gen-0) docs count through the CACHED facet sidecar (ST2 ≈
        the reference's per-shard SortedSetDocValues reader state,
        ``Lucene.java:182-198``): dictionary codes in doc-id order, so a
        query costs O(|candidates|) bincount — no doc-store scan. Delta
        commits are counted from their (small) delta doc stores first,
        which also shadows stale base rows of updated docs.

        ``MatchAll`` never materializes the candidate id universe
        (dense-id indexes): the candidate set is implicit ("all") and
        only the (small) EXCLUSION set — base tombstones + delta-shadowed
        ids — is built."""
        q = self._rewrite_meta_fields(q)
        docs = None if (isinstance(q, MatchAll) and self._implicit) \
            else self._eval(q)[0]
        if dims is None and ranges is None:
            dims = [f for f in self.manifest.meta_cols
                    if pa.types.is_string(self._doc_ds.schema.field(f).type)]
        out: dict = {}
        scan_cols = list(dims or []) + list(ranges or [])
        if not scan_cols:
            return out
        counters: dict[str, dict] = {d: {} for d in (dims or [])}
        range_counts: dict[str, list[int]] = {
            f: [0] * len(rs) for f, rs in (ranges or {}).items()}

        # ---- delta generations: scan their (small) doc stores --------
        delta_matched: list[np.ndarray] = []
        for gen, src in self._doc_sources[1:]:
            for batch in src.to_batches(
                    columns=list(dict.fromkeys(["doc_id"] + scan_cols))):
                bids = batch["doc_id"].to_numpy(zero_copy_only=False)
                if docs is None:
                    member = np.ones(len(bids), dtype=bool)
                elif not len(docs):
                    break
                else:
                    pos = np.minimum(np.searchsorted(docs, bids),
                                     len(docs) - 1)
                    member = docs[pos] == bids
                keep = self._live_mask(gen, bids)
                if keep is not None:
                    member &= keep
                if not member.any():
                    continue
                delta_matched.append(bids[member])
                for d in dims or []:
                    vc = pc.value_counts(batch[d].filter(pa.array(member)))
                    c = counters[d]
                    for s in vc:
                        key = s["values"].as_py()
                        c[key] = c.get(key, 0) + s["counts"].as_py()
                for f, rs in (ranges or {}).items():
                    arr = batch[f]
                    if pa.types.is_timestamp(arr.type):
                        arr = arr.cast(pa.int64())
                    vals = arr.to_numpy(zero_copy_only=False)[member]
                    for i, (_label, lo, hi) in enumerate(rs):
                        range_counts[f][i] += int(
                            np.count_nonzero((vals >= lo) & (vals < hi)))

        # ---- base: cached sidecar lookup ------------------------------
        base_docs = docs
        exclude = np.empty(0, np.int64)
        if docs is None:
            # implicit MatchAll: exclusion set = base tombstones +
            # delta-shadowed ids (both small); candidates stay implicit
            n_base = int(self._bases[-1])
            dead0 = self._tombstones_after(0)
            parts = [dead0[dead0 < n_base]]
            if delta_matched:
                shadow = np.concatenate(delta_matched)
                parts.append(shadow[shadow < n_base])
            exclude = np.unique(np.concatenate(parts)) if parts else exclude
            has_base = n_base - len(exclude) > 0
        elif delta_matched:
            shadow = np.concatenate(delta_matched)
            base_docs = docs[~np.isin(docs, shadow)]
            has_base = len(base_docs) > 0
        else:
            has_base = len(base_docs) > 0
        if has_base and self._actors is not None:
            # sharded facet state (ST2 on the SegmentActor pool): each
            # actor counts its shards' candidates locally; the driver
            # merges ≤max_labels-sized dicts — forward arrays never
            # leave the actors.
            import ray

            cand_ref = None if base_docs is None else ray.put(base_docs)
            outs = ray.get([
                a.facet_counts.remote(cand_ref, list(dims or []),
                                      dict(ranges or {}), exclude)
                for a in self._actors])
            self._facet_rows_resident_remote = sum(o[2] for o in outs)
            for cnts, rngs, _resident in outs:
                for d, c in cnts.items():
                    cd = counters[d]
                    for label, v in c.items():
                        cd[label] = cd.get(label, 0) + v
                for f, lst in rngs.items():
                    for i, v in enumerate(lst):
                        range_counts[f][i] += v
        elif has_base:
            st = self._facet_state_obj()
            ids = st.ids()
            if base_docs is None:
                if len(exclude):
                    mask = np.ones(len(ids), dtype=bool)
                    pos = np.minimum(np.searchsorted(ids, exclude),
                                     max(0, len(ids) - 1))
                    hit = ids[pos] == exclude if len(ids) else \
                        np.zeros(len(exclude), bool)
                    mask[pos[hit]] = False
                    sel = np.flatnonzero(mask)
                else:
                    sel = slice(None)
            else:
                pos = np.minimum(np.searchsorted(ids, base_docs),
                                 max(0, len(ids) - 1))
                member = ids[pos] == base_docs if len(ids) else \
                    np.zeros(len(base_docs), bool)
                sel = pos[member]
            for d in dims or []:
                codes, labels = st.string_dim(d)
                cs = codes[sel]
                cs = cs[cs >= 0]  # nulls excluded
                bc = np.bincount(cs, minlength=len(labels))
                c = counters[d]
                for li in np.flatnonzero(bc):
                    c[labels[li]] = c.get(labels[li], 0) + int(bc[li])
            for f, rs in (ranges or {}).items():
                vals = st.numeric_dim(f)[sel]
                for i, (_label, lo, hi) in enumerate(rs):
                    range_counts[f][i] += int(
                        np.count_nonzero((vals >= lo) & (vals < hi)))

        for d in dims or []:
            top = sorted(counters[d].items(), key=lambda kv: (-kv[1], kv[0]))
            out[d] = {k: v for k, v in top[:max_labels]}
        for f, rs in (ranges or {}).items():
            out[f] = {
                label: {"doc_count": range_counts[f][i], "from": lo, "to": hi}
                for i, (label, lo, hi) in enumerate(rs)
            }
        return out

    def explain(self, q: Query, doc_id) -> dict:
        """Lucene ``IndexSearcher.explain`` analog: why (and how much)
        one document scores under a query. Returns an
        Explanation-shaped nested dict ``{matched, value, description,
        details}``. Every node's value comes from the SAME evaluation
        path search uses (``_eval`` per node, the doc binary-searched
        in the node's result — never a parallel reimplementation), and
        Term leaves additionally decompose into the BM25 factors: tf
        from the doc store's stored term vector, df/idf from the term
        dictionary, dl/avgdl length normalization. Debug surface — the
        cost is one posting evaluation per query node, the same
        contract as Lucene's explain."""
        q = self._rewrite_meta_fields(q)
        return self._explain_node(q, int(doc_id))

    def _node_match(self, q: Query, d: int) -> tuple[bool, float, bool]:
        # (d, d) block-skip window: only posting blocks covering the
        # explained doc decode — same values, explain stays O(blocks
        # touched), not O(postings)
        docs, sc = self._eval(q, doc_range=(d, d))
        pos = int(np.searchsorted(docs, d))
        matched = pos < len(docs) and int(docs[pos]) == d
        scoring = sc is not None
        value = float(sc[pos]) if (matched and scoring) else \
            (1.0 if matched else 0.0)
        return matched, value, scoring

    def _bm25_leaf_details(self, q: Term, d: int) -> list[dict]:
        freqs = self._stored_term_freqs(d)
        if not freqs:
            return []
        dl = float(sum(freqs.values()))
        k1, b = self.cfg.k1, self.cfg.b
        out = []
        for s in self._term_stems(q):
            df = int(self.term_df(s))
            tf = float(freqs.get(s, 0))
            if df == 0 or tf == 0:
                continue
            idf = self.idf(df)
            avgdl = self._avgdl_of(s)
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            out.append({
                "matched": True, "value": idf * tfn,
                "description": f"weight({s}) = idf * tfnorm",
                "details": [
                    {"matched": True, "value": idf,
                     "description": (f"idf = ln(1+(N-df+0.5)/(df+0.5)),"
                                     f" df={df}, N={self.N}"),
                     "details": []},
                    {"matched": True, "value": tfn,
                     "description": (f"tfnorm = tf*(k1+1)/(tf+k1*(1-b+"
                                     f"b*dl/avgdl)), tf={tf}, dl={dl},"
                                     f" avgdl={round(avgdl, 4)},"
                                     f" k1={k1}, b={b}"),
                     "details": []},
                ]})
        return out

    def _explain_node(self, q: Query, d: int) -> dict:
        matched, value, scoring = self._node_match(q, d)
        details: list[dict] = []
        if isinstance(q, Term) and (q.field is None
                                    or q.field in self.text_fields):
            desc = f"term {q.text!r}" + (f" field {q.field!r}"
                                         if q.field else "")
            if matched:
                details = self._bm25_leaf_details(q, d)
        elif isinstance(q, Phrase):
            desc = "phrase " + " ".join(q.terms)
        elif isinstance(q, Or):
            desc = (f"Or (sum of matching clauses, min_should="
                    f"{q.min_should})")
            details = [self._explain_node(c, d) for c in q.clauses]
        elif isinstance(q, And):
            desc = "And (sum of matching MUST clauses)"
            details = [self._explain_node(c, d) for c in q.clauses] \
                + [self._explain_node(f, d) for f in q.filters]
        elif isinstance(q, DisMax):
            desc = f"DisMax (max + {q.tie} * others)"
            details = [self._explain_node(c, d) for c in q.clauses]
        elif isinstance(q, Not):
            desc = "Not (positive minus negative)"
            neg = self._explain_node(q.negative, d)
            neg["description"] = "MUST_NOT: " + neg["description"]
            details = [self._explain_node(q.positive, d), neg]
        elif isinstance(q, Boost):
            desc = "Boost (MUST required + SHOULD optional)"
            details = [self._explain_node(q.required, d),
                       self._explain_node(q.optional, d)]
        elif isinstance(q, Weight):
            desc = f"Weight (inner score * {q.factor})"
            details = [self._explain_node(q.query, d)]
        elif isinstance(q, Filter):
            desc = (f"filter {q.field_name} IN {list(q.values)!r} "
                    "(non-scoring)")
        elif isinstance(q, RangeFilter):
            desc = (f"range {q.field_name} "
                    f"[{q.lo!r} TO {q.hi!r}] (non-scoring)")
        elif isinstance(q, (Wildcard, Regexp, Fuzzy)):
            desc = f"{type(q).__name__.lower()} {q.pattern!r}" \
                if not isinstance(q, Fuzzy) else \
                f"fuzzy {q.text!r}~{q.max_edits}"
        elif isinstance(q, MatchAll):
            desc = "match-all"
        else:
            desc = type(q).__name__
        return {"matched": matched,
                "value": round(value, 6),
                "scoring": scoring,
                "description": desc,
                "details": details}

    def significant_terms(self, q: Query, field: str, *, k: int = 10,
                          min_doc_count: int = 1) -> pa.Table:
        """ES ``significant_terms`` aggregation over a string doc-store
        column: foreground = docs matching ``q``, background = the
        whole live corpus, scored with ES's default JLH heuristic
        ``(fg_pct - bg_pct) * (fg_pct / bg_pct)`` where the pcts are
        label count / label-total within each set (null-field docs
        excluded from both totals, keeping the ratio SQL-restatable).
        Rows ``(term, fg_count, bg_count, score)``, score desc / term
        asc, labels below ``min_doc_count`` foreground docs dropped.
        Both counting passes run through the cached facet sidecar (or
        the sharded actor facet state) — O(labels) driver traffic,
        never a doc-store scan. The score arithmetic keeps one fixed
        operation order so ranks reproduce bit-identically across
        runtimes."""
        big = 1 << 31
        fg = self.facets(q, dims=[field], max_labels=big).get(field, {})
        bg = self.facets(MatchAll(), dims=[field],
                         max_labels=big).get(field, {})
        ft = float(sum(fg.values()))
        bt = float(sum(bg.values()))
        rows = []
        for term, c in fg.items():
            if c < min_doc_count:
                continue
            fp = c / ft
            bp = bg[term] / bt  # fg ⊆ bg: always present, > 0
            score = (fp - bp) * (fp / bp)
            rows.append((term, int(c), int(bg[term]), score))
        rows.sort(key=lambda r: (-r[3], r[0]))
        rows = rows[:k]
        return pa.table({
            "term": pa.array([r[0] for r in rows], pa.string()),
            "fg_count": pa.array([r[1] for r in rows], pa.int64()),
            "bg_count": pa.array([r[2] for r in rows], pa.int64()),
            "score": pa.array([round(r[3], 6) for r in rows],
                              pa.float64()),
        })

    def _facet_state_obj(self):
        if getattr(self, "_facet_state", None) is None:
            from icat_lucene_ray.index.facets import FacetState

            self._facet_state = FacetState(self)
        return self._facet_state


# ---------------------------------------------------------------------------
# Distributed field-sorted top-k (K2/K3)
# ---------------------------------------------------------------------------

def _sort_after_mask(keys, ids, sort, after):
    """Rows strictly after the cursor in (sort keys..., doc_id asc)."""
    m = np.zeros(len(ids), dtype=bool)
    eq = np.ones(len(ids), dtype=bool)
    for (_name, desc), arr, cv in zip(sort, keys, after["values"]):
        if arr.dtype.kind == "M":
            cv = np.datetime64(cv, "us") \
                if not isinstance(cv, (int, np.integer)) else cv
        gt = (arr < cv) if desc else (arr > cv)
        m |= eq & gt
        eq &= arr == cv
    m |= eq & (ids > int(after["doc_id"]))
    return m


def _field_sort_order(keys, ids, sort) -> np.ndarray:
    """lexsort order over (sort keys..., doc_id asc); descending numeric
    keys negate, descending strings rank-invert (rank order is
    collation-consistent within the array being sorted)."""
    lex = [ids]
    for (_name, desc), arr in zip(reversed(sort), reversed(keys)):
        if desc:
            if arr.dtype.kind in "iufM":
                lex.append(-arr.astype(np.float64)
                           if arr.dtype.kind == "f" else -arr.astype(np.int64))
            else:
                _uniq, inv = np.unique(arr, return_inverse=True)
                lex.append(-inv)
        else:
            lex.append(arr)
    return np.lexsort(tuple(lex))


def _table_field_topk(t: pa.Table, sort, k, cand, after):
    """Local top-k of one doc-store table slice -> (ids, [key arrays])
    with ≤ k rows, or None when nothing survives the filters."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    if not len(ids):
        return None
    sel = None
    if cand is not None:
        pos = np.minimum(np.searchsorted(cand, ids), max(0, len(cand) - 1))
        sel = (cand[pos] == ids) if len(cand) else np.zeros(len(ids), bool)
        if not sel.any():
            return None
        ids = ids[sel]
    keys = []
    for name, _desc in sort:
        arr = t[name]
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        a = arr.to_numpy(zero_copy_only=False)
        keys.append(a[sel] if sel is not None else a)
    if after is not None:
        m = _sort_after_mask(keys, ids, sort, after)
        if not m.any():
            return None
        ids = ids[m]
        keys = [a[m] for a in keys]
    order = _field_sort_order(keys, ids, sort)[:k]
    return ids[order], [a[order] for a in keys]


def _fragment_topk_local(files, sort, k, cand, after, tomb):
    """Top-k over a group of base doc-store files (one task's share).
    ``files``: [(path, dense_id_base | None)]. Returns merged ≤k rows."""
    import pyarrow.parquet as pq_

    sort_cols = [f for f, _ in sort]
    parts = []
    for path, base in files:
        cols = sort_cols if base is not None else \
            list(dict.fromkeys(["doc_id"] + sort_cols))
        t = pq_.read_table(path, columns=cols)
        if base is not None:
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(base, base + t.num_rows), pa.int64()))
        if tomb is not None and len(tomb):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, tomb)
            if not keep.all():
                t = t.filter(pa.array(keep))
        got = _table_field_topk(t, sort, k, cand, after)
        if got is not None:
            parts.append(got)
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    keys = [np.concatenate([p[1][i] for p in parts]) for i in range(len(sort))]
    order = _field_sort_order(keys, ids, sort)[:k]
    return ids[order], [a[order] for a in keys]


#: below this many candidate docs, collapse/stats/histogram skip the
#: per-fragment fan-out and do O(k) point lookups inline — fragment-task
#: dispatch costs more than reading k rows
_AGG_INLINE_MAX = 32768


def _table_numeric_partial(t: pa.Table, field, cand):
    """(count, sum, min, max) partial over one doc-store table's
    ``field`` column restricted to the candidate id set (``cand is
    None`` = all rows). NULL values are skipped (SQL aggregate
    semantics). Returns the 4-tuple or None when nothing matches."""
    if t.num_rows == 0:
        return None
    if cand is not None:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(cand):
            return None
        pos = np.minimum(np.searchsorted(cand, ids), len(cand) - 1)
        hit = cand[pos] == ids
        if not hit.any():
            return None
        t = t.filter(pa.array(hit))
    col = t[field]
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return None
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return (len(v), float(v.sum()), float(v.min()), float(v.max()))


def _fragment_stats_local(files, field, cand, tomb):
    """Numeric-aggregate partial over a group of base doc-store files
    (one task's share). Returns (count, sum, min, max) or None."""
    import pyarrow.parquet as pq_

    parts = []
    for path, base in files:
        cols = [field] if base is not None else \
            list(dict.fromkeys(["doc_id", field]))
        t = pq_.read_table(path, columns=cols)
        if base is not None:
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(base, base + t.num_rows), pa.int64()))
        if tomb is not None and len(tomb):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, tomb)
            if not keep.all():
                t = t.filter(pa.array(keep))
        got = _table_numeric_partial(t, field, cand)
        if got is not None:
            parts.append(got)
    return _merge_stats_partials(parts)


def _table_hist_partial(t: pa.Table, field, cand, interval, offset):
    """Histogram partial over one doc-store table restricted to the
    candidate id set: dict {bucket_index -> count} with bucket_index =
    floor((v - offset) / interval). NULLs skipped."""
    if t.num_rows == 0:
        return None
    if cand is not None:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(cand):
            return None
        pos = np.minimum(np.searchsorted(cand, ids), len(cand) - 1)
        hit = cand[pos] == ids
        if not hit.any():
            return None
        t = t.filter(pa.array(hit))
    col = t[field]
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return None
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    b = np.floor((v - offset) / interval).astype(np.int64)
    uniq, cnt = np.unique(b, return_counts=True)
    return dict(zip(uniq.tolist(), cnt.tolist()))


def _fragment_hist_local(files, field, cand, tomb, interval, offset):
    """Histogram partial over a group of base doc-store files (one
    task's share): merged {bucket_index -> count} or None."""
    import pyarrow.parquet as pq_

    out: dict = {}
    for path, base in files:
        cols = [field] if base is not None else \
            list(dict.fromkeys(["doc_id", field]))
        t = pq_.read_table(path, columns=cols)
        if base is not None:
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(base, base + t.num_rows), pa.int64()))
        if tomb is not None and len(tomb):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, tomb)
            if not keep.all():
                t = t.filter(pa.array(keep))
        got = _table_hist_partial(t, field, cand, interval, offset)
        if got:
            for k, c in got.items():
                out[k] = out.get(k, 0) + c
    return out or None


def _merge_stats_partials(parts):
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    return (sum(p[0] for p in parts), sum(p[1] for p in parts),
            min(p[2] for p in parts), max(p[3] for p in parts))


def _best_per_key(keys, ids, scores):
    """Champion row per collapse key: best score, doc_id-asc tiebreak.
    Vectorized — lexsort puts each key's best occurrence first, then
    ``np.unique(return_index=True)`` picks it."""
    order = np.lexsort((ids, -scores))
    _, first = np.unique(keys[order], return_index=True)
    sel = order[first]
    return keys[sel], ids[sel], scores[sel]


def _table_collapse_best(t: pa.Table, field, cand, cand_scores):
    """Best doc per collapse key over one doc-store table restricted to
    the candidate (ids, scores) set (``cand is None`` = match-all at
    score 1.0). Returns (keys, ids, scores) with one row per distinct
    key, or None. NULL-key rows are excluded."""
    if t.num_rows == 0:
        return None
    col = t[field]
    if col.null_count:
        m = pc.is_valid(col)
        t = t.filter(m)
        col = t[field]
        if t.num_rows == 0:
            return None
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    keys = col.to_numpy(zero_copy_only=False)
    if cand is None:
        m_ids, m_sc, m_keys = ids, np.ones(len(ids)), keys
    else:
        if not len(cand):
            return None
        pos = np.minimum(np.searchsorted(cand, ids), len(cand) - 1)
        hit = cand[pos] == ids
        if not hit.any():
            return None
        m_ids = ids[hit]
        m_sc = cand_scores[pos[hit]]
        m_keys = keys[hit]
    return _best_per_key(m_keys, m_ids, m_sc)


def _fragment_collapse_local(files, field, cand, cand_scores, tomb):
    """Per-key champions over a group of base doc-store files (one
    task's share). ``files``: [(path, dense_id_base | None)]. Returns
    merged (keys, ids, scores) — ≤ distinct-keys rows — or None."""
    import pyarrow.parquet as pq_

    parts = []
    for path, base in files:
        cols = [field] if base is not None else \
            list(dict.fromkeys(["doc_id", field]))
        t = pq_.read_table(path, columns=cols)
        if base is not None:
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(base, base + t.num_rows), pa.int64()))
        if tomb is not None and len(tomb):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, tomb)
            if not keep.all():
                t = t.filter(pa.array(keep))
        got = _table_collapse_best(t, field, cand, cand_scores)
        if got is not None:
            parts.append(got)
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    keys = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    sc = np.concatenate([p[2] for p in parts])
    return _best_per_key(keys, ids, sc)


def _ray_initialized() -> bool:
    try:
        import ray

        return ray.is_initialized()
    except Exception:
        return False


def _scan_filter_local(files, scan_cols, out_cols, expr) -> pa.Table | None:
    """Predicate scan over a group of base doc-store files (one task's
    share). ``files``: [(path, dense_id_base)]. Returns matching rows
    (out_cols) or None."""
    import pyarrow.parquet as pq_

    parts = []
    for path, base in files:
        t = pq_.read_table(path, columns=scan_cols)
        t = t.add_column(0, "doc_id", pa.array(
            np.arange(base, base + t.num_rows), pa.int64()))
        t = pads.dataset(t).to_table(filter=expr)
        if t.num_rows:
            parts.append(t.select(out_cols))
    return pa.concat_tables(parts) if parts else None


def _sorted_member_mask(haystack: np.ndarray, needles: np.ndarray
                        ) -> np.ndarray:
    """membership of ``needles`` in SORTED ``haystack`` via searchsorted
    (no hash build per task)."""
    if len(haystack) == 0:
        return np.zeros(len(needles), dtype=bool)
    pos = np.minimum(np.searchsorted(haystack, needles), len(haystack) - 1)
    return haystack[pos] == needles


def _export_scan_batch(batch, *, ids_ref, sc_ref, tomb_ref, expr,
                       scan_cols, out_cols, with_score, schema):
    """One ``matches_dataset`` scan task: read its doc-store files, keep
    live matching rows, attach scores. Broadcast state (match ids,
    scores, per-generation tombstones) arrives as object refs — fetched
    zero-copy from the local object store, never re-shipped per batch."""
    import ray
    import pyarrow.parquet as pq_

    ids = ray.get(ids_ref) if ids_ref is not None else None
    scores = ray.get(sc_ref) if sc_ref is not None else None
    tombs = ray.get(tomb_ref) if tomb_ref is not None else {}
    parts = []
    for path, base, gen in zip(batch["path"], batch["base"], batch["gen"]):
        base, gen = int(base), int(gen)
        cols = [c for c in scan_cols if c != "doc_id"] if base >= 0 \
            else list(scan_cols)
        t = pq_.read_table(path, columns=cols)
        if base >= 0:  # dense ids: base + row position
            t = t.add_column(0, "doc_id", pa.array(
                np.arange(base, base + t.num_rows), pa.int64()))
        rid = t["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        keep = np.ones(len(rid), dtype=bool)
        if ids is not None:
            keep &= _sorted_member_mask(ids, rid)
        ta = tombs.get(gen)
        if ta is not None and len(ta):
            keep &= ~_sorted_member_mask(ta, rid)
        if not keep.all():
            t = t.filter(pa.array(keep))
        if expr is not None and t.num_rows:
            t = pads.dataset(t).to_table(filter=expr)
        if not t.num_rows:
            continue
        t = t.select(out_cols)
        if with_score:
            if scores is None:
                sc = np.ones(t.num_rows, np.float64)
            else:
                rid2 = t["doc_id"].to_numpy(zero_copy_only=False)
                sc = scores[np.searchsorted(ids, rid2)]
            t = t.append_column("score", pa.array(sc, pa.float64()))
        parts.append(t.cast(schema))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts)


def _make_fragment_task():
    import ray

    @ray.remote
    def _task(files, sort, k, cand, after, tomb):
        return _fragment_topk_local(files, sort, k, cand, after, tomb)

    return _task


def _make_scan_task():
    import ray

    @ray.remote
    def _scan(files, scan_cols, out_cols, expr):
        return _scan_filter_local(files, scan_cols, out_cols, expr)

    return _scan


class _LazyScanTask:
    _fn = None

    @classmethod
    def remote(cls, *a):
        if cls._fn is None:
            cls._fn = _make_scan_task()
        return cls._fn.remote(*a)


_fragment_filter_scan = _LazyScanTask


class _LazyFragTask:
    _fn = None

    @classmethod
    def remote(cls, *a):
        if cls._fn is None:
            cls._fn = _make_fragment_task()
        return cls._fn.remote(*a)


_fragment_field_topk = _LazyFragTask


def _make_collapse_task():
    import ray

    @ray.remote
    def _collapse(files, field, cand, cand_scores, tomb):
        return _fragment_collapse_local(files, field, cand, cand_scores,
                                        tomb)

    return _collapse


class _LazyCollapseTask:
    _fn = None

    @classmethod
    def remote(cls, *a):
        if cls._fn is None:
            cls._fn = _make_collapse_task()
        return cls._fn.remote(*a)


_fragment_collapse_best = _LazyCollapseTask


def _make_stats_task():
    import ray

    @ray.remote
    def _stats(files, field, cand, tomb):
        return _fragment_stats_local(files, field, cand, tomb)

    return _stats


class _LazyStatsTask:
    _fn = None

    @classmethod
    def remote(cls, *a):
        if cls._fn is None:
            cls._fn = _make_stats_task()
        return cls._fn.remote(*a)


_fragment_stats = _LazyStatsTask


def _make_hist_task():
    import ray

    @ray.remote
    def _hist(files, field, cand, tomb, interval, offset):
        return _fragment_hist_local(files, field, cand, tomb, interval,
                                    offset)

    return _hist


class _LazyHistTask:
    _fn = None

    @classmethod
    def remote(cls, *a):
        if cls._fn is None:
            cls._fn = _make_hist_task()
        return cls._fn.remote(*a)


_fragment_hist = _LazyHistTask


# ---------------------------------------------------------------------------
# Actor-pool serving
# ---------------------------------------------------------------------------

def _make_segment_actor():
    import ray

    @ray.remote
    class _SegmentActor:
        """Owns a subset of segments; state (term dict, posting cache)
        lives for the actor's lifetime ≈ ST1 SearcherManager. Also owns
        a subset of FACET SHARDS (ST2 sharded onto the pool —
        ``Lucene.java:182-198`` per-shard reader state): facet forward
        arrays load once per actor and every query returns only merged
        label-count dicts to the driver."""

        def __init__(self, paths: dict[int, str], codec_block: int,
                     facet_shards: list[tuple] | None = None,
                     meta_cols: list[str] | None = None):
            from icat_lucene_ray.index.facets import FacetShard

            self.group = SegmentGroupReader(paths, codec_block)
            self.facet_shards = [
                FacetShard(part, base_file, id_base, meta_cols or [])
                for part, base_file, id_base in (facet_shards or [])]

        def facet_counts(self, cand, dims, ranges, exclude=None):
            """Label/range counts for candidate docs over THIS actor's
            facet shards (``cand=None`` = all docs except the small
            ``exclude`` set — the MatchAll path). Returns
            ({dim: {label: n}}, {field: [n...]}, resident_rows) —
            resident_rows evidences where the state lives."""
            counters = {d: {} for d in dims}
            range_counts = {f: [0] * len(rs) for f, rs in ranges.items()}
            for sh in self.facet_shards:
                sh.count_into(cand, dims, ranges, counters, range_counts,
                              exclude=exclude)
            resident = sum(len(sh._ids) for sh in self.facet_shards
                           if sh._ids is not None)
            return counters, range_counts, resident

        def score_term(self, seg_id, term, bucket, idf, k1, b, avgdl,
                       doc_range=None):
            return self.group.score_term(
                seg_id, term, bucket, idf, k1, b, avgdl, doc_range)

        def df(self, seg_id, term, bucket=0):
            return self.group.df(seg_id, term, bucket)

        def block_meta(self, seg_id, term, bucket=0):
            r = self.group.reader(seg_id)
            return None if r is None else r.block_meta(term, bucket)

        def term_positions_for(self, seg_id, term, bucket, cand):
            r = self.group.reader(seg_id)
            return None if r is None else \
                r.term_positions_for(term, bucket, cand)

        def score_blocks(self, seg_id, term, bucket, idf, k1, b, avgdl,
                         sel_blocks):
            r = self.group.reader(seg_id)
            return (np.empty(0, np.int64), np.empty(0, np.float64)) \
                if r is None else r.score_blocks(
                    term, bucket, idf, k1, b, avgdl, sel_blocks)

    return _SegmentActor


class _LazyActor:
    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is None:
            cls._cls = _make_segment_actor()
        return cls._cls

    @classmethod
    def remote(cls, *a, **kw):
        return cls.get().remote(*a, **kw)


SegmentActor = _LazyActor
