"""Analysis chains — pure, versioned Python equivalents of the
reference's Lucene analyzers.

Reference chain (``IcatAnalyzer.java:35-41``):
``StandardTokenizer -> EnglishPossessiveFilter -> LowerCaseFilter ->
StopFilter(27 scientific stop words) -> PorterStemFilter``; the synonym
variant appends a SynonymGraphFilter (``IcatSynonymAnalyzer.java:48-56``).
Golden behavior is pinned by tests mirroring ``TestLucene.java:90-200``.

These are deterministic pure functions: the same text always yields the
same token stream (required for resumable/idempotent index builds and
for rank-identity vs the brute-force oracle).

Hot-path notes: tokenization is regex ``findall`` per string; the
per-token pipeline (possessive -> lower -> stop -> stem) is memoized in
a per-analyzer dict keyed on the *raw* token, which on Zipfian text hits
>99% — per-batch cost is then one dict lookup per token. Analyzer
objects are built once per actor (``__init__``) when used inside
``map_batches`` actor pools.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable

from icat_lucene_ray.analysis.porter import porter_stem
from icat_lucene_ray.analysis.synonyms import (
    default_synonym_lines,
    parse_solr_synonyms,
)

# The reference's scientific stop set (IcatAnalyzer.java:25-31):
# Lucene's ENGLISH_STOP_WORDS_SET minus the chemical symbols
# As / At / Be / In / No / Of / On? — precisely: it drops "as", "at",
# "be", "in", "no", "of" stays out too (see golden: "demo of ..." keeps
# "of"). The exact 27-word list:
SCIENTIFIC_STOP_WORDS = frozenset(
    {
        "a", "an", "and", "are", "but", "by", "for", "if", "into", "is",
        "it", "not", "on", "or", "such", "that", "the", "their", "then",
        "there", "these", "they", "this", "to", "was", "will", "with",
    }
)

# Approximation of UAX#29 word-break (Lucene StandardTokenizer):
# - runs of letters/digits/underscore are one token
# - internal ASCII/typographic apostrophes join letter runs
#   ("TokenStream's" is one token; the possessive filter then strips it)
# - numeric tokens keep internal . and , ("3.14", "1,000")
_TOKEN_RE = re.compile(
    r"\d+(?:[.,]\d+)+"          # decimals / grouped numbers
    r"|\w+(?:['’]\w+)*",   # words (incl. digits), apostrophe-joined
    re.UNICODE,
)

_POSSESSIVE_RE = re.compile(r"['’][sS]$")


class _BaseAnalyzer:
    """Shared machinery: regex tokenize + memoized per-token pipeline."""

    #: bump when token semantics change — stored in the index manifest so
    #: a query layer can refuse to run against an incompatible index.
    version: str = "icat-1"
    name: str = "icat"
    #: re2 pattern of separator runs for the vectorized batch kernel; the
    #: complement class must be a superset of every char the token regex
    #: can consume (so pre-splitting on it is lossless)
    candidate_split: str = r"[^\p{L}\p{N}\p{M}_'’.,]+"

    def __init__(self) -> None:
        self._memo: dict[str, tuple[str, ...]] = {}

    # -- per-token chain; returns () if the token is stopped ----------
    def _transform(self, raw: str) -> tuple[str, ...]:
        tok = _POSSESSIVE_RE.sub("", raw)
        tok = tok.lower()
        if tok in SCIENTIFIC_STOP_WORDS:
            return ()
        return (porter_stem(tok),)

    def tokens(self, text: str) -> list[str]:
        """Full ordered token stream for one string."""
        memo = self._memo
        out: list[str] = []
        for raw in _TOKEN_RE.findall(text):
            got = memo.get(raw)
            if got is None:
                got = self._transform(raw)
                if len(memo) < (1 << 20):
                    memo[raw] = got
            out.extend(got)
        return out

    def term_freqs(self, text: str) -> Counter:
        return Counter(self.tokens(text))

    def raw_tokens(self, text: str) -> list[str]:
        """Surface (pre-analysis) token stream, original case — the
        display units for highlighting. ``candidate_expansion(raw)``
        maps each one to its posting stems, so highlighters can test
        membership against a query's stem set without re-deriving the
        token boundary rules."""
        return _TOKEN_RE.findall(text)

    def analyze_query_term(self, term: str) -> list[str]:
        """Analyze a single query-side term (used by the query compiler,
        mirroring the reference analyzing query text with the same
        analyzer, DocumentMapping.java:136)."""
        return self.tokens(term)

    # -- positional stream (Q4, behind EngineConfig.positions) --------
    def candidate_expansion(self, cand: str) -> tuple[tuple, tuple, int]:
        """One pre-split candidate -> (stems, local raw-token positions,
        raw token count). Stopped tokens still advance the position
        (Lucene StopFilter position increments); every stem expanded
        from one raw token shares its position (synonym-graph style)."""
        stems: list[str] = []
        lpos: list[int] = []
        raws = _TOKEN_RE.findall(cand)
        for j, raw in enumerate(raws):
            for s in self._transform(raw):
                stems.append(s)
                lpos.append(j)
        return tuple(stems), tuple(lpos), len(raws)

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """Scalar reference for the positional batch kernel: position =
        raw-token index over the full text (token runs never span a
        candidate-split boundary, so this equals base + local)."""
        out: list[tuple[str, int]] = []
        for j, raw in enumerate(_TOKEN_RE.findall(text)):
            for s in self._transform(raw):
                out.append((s, j))
        return out


class IcatAnalyzer(_BaseAnalyzer):
    """StandardTokenizer → possessive strip → lowercase → scientific
    stop filter → Porter stem (IcatAnalyzer.java:35-41)."""


class IcatSynonymAnalyzer(_BaseAnalyzer):
    """IcatAnalyzer + post-stem synonym expansion
    (IcatSynonymAnalyzer.java:48-56, expand=true). Multi-token rules
    ("new york, ny") match CONSECUTIVE stems in the stream and add the
    class's other members' stems (SynonymGraphFilter insertion with
    bag-of-stems semantics; see analysis/synonyms.py)."""

    version = "icat_synonym-1"
    name = "icat_synonym"

    def __init__(self, synonym_lines: Iterable[str] | None = None) -> None:
        super().__init__()
        from icat_lucene_ray.analysis.synonyms import parse_solr_synonyms_full

        self._base = IcatAnalyzer()  # pre-synonym chain (rule analysis +
        #                              the stream the multi pass scans)
        lines = list(synonym_lines) if synonym_lines is not None else default_synonym_lines()
        self._synonyms, self.multi_synonyms = parse_solr_synonyms_full(
            lines, self._base.tokens)

    def _transform(self, raw: str) -> tuple[str, ...]:
        base = super()._transform(raw)
        if not base:
            return ()
        stem = base[0]
        expansion = self._synonyms.get(stem)
        return expansion if expansion is not None else base

    def tokens_base(self, text: str) -> list[str]:
        """Per-candidate chain WITHOUT the multi-token stream pass — the
        vectorized kernel memoizes this per candidate and applies the
        stream pass itself (applying it per candidate would double-count
        any within-candidate match)."""
        return _BaseAnalyzer.tokens(self, text)

    def tokens_presyn(self, text: str) -> list[str]:
        """PRE-synonym stream (the stream synonym matching scans — like
        SynonymGraphFilter, inserted tokens are never re-matched)."""
        return self._base.tokens(text)

    def tokens(self, text: str) -> list[str]:
        out = super().tokens(text)
        if self.multi_synonyms:
            out = out + self._multi_matches(self._base.tokens(text))
        return out

    def _multi_matches(self, stream: list[str]) -> list[str]:
        """Extra stems for every multi-token rule sequence matched
        against consecutive PRE-SYNONYM stream stems (bag insertion;
        originals stay; expansion output is never re-matched)."""
        extra: list[str] = []
        n = len(stream)
        for seq, add in self.multi_synonyms:
            L = len(seq)
            for i in range(n - L + 1):
                if tuple(stream[i:i + L]) == seq:
                    extra.extend(add)
        return extra


class SimpleAnalyzer(_BaseAnalyzer):
    """Lowercase word-split only — no stop words, no stemming.

    Exists so pipelines can be cross-checked against a plain-SQL oracle
    (``string_split`` semantics) and for corpora that are already
    normalized tokens.
    """

    version = "simple-1"
    name = "simple"
    candidate_split = r"\s+"  # tokens are maximal non-space runs

    _SIMPLE_RE = re.compile(r"\S+")

    def tokens(self, text: str) -> list[str]:
        return self._SIMPLE_RE.findall(text.lower())

    def raw_tokens(self, text: str) -> list[str]:
        return self._SIMPLE_RE.findall(text)

    def candidate_expansion(self, cand: str) -> tuple[tuple, tuple, int]:
        toks = self._SIMPLE_RE.findall(cand.lower())
        return tuple(toks), tuple(range(len(toks))), len(toks)

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        return [(t, j) for j, t in enumerate(self.tokens(text))]


class SeparatorAnalyzer(_BaseAnalyzer):
    """Split on one separator char + lowercase
    (IcatSeparatorAnalyzer.java:13-26; used for ``location`` with '/'
    and ``location.fileName`` with '.'). Indexable: registered as
    ``path`` (separator '/')."""

    version = "sep-1"
    name = "path"
    candidate_split = r"\s+"  # paths contain no spaces; one candidate each

    def __init__(self, separator: str = "/") -> None:
        super().__init__()
        self.separator = separator
        self.version = f"sep({separator})-1"

    def tokens(self, text: str) -> list[str]:
        return [p.lower() for w in text.split() for p in
                w.split(self.separator) if p]


class PathHierarchyAnalyzer(_BaseAnalyzer):
    """Case-sensitive path-prefix tokens (``location.exact``,
    Lucene.java:440-445): ``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c``.
    Applied per whitespace-separated path (so the vectorized kernel's
    pre-split is lossless)."""

    version = "pathhier-1"
    name = "path_hierarchy"
    candidate_split = r"\s+"

    def tokens(self, text: str) -> list[str]:
        out: list[str] = []
        for w in text.split():
            acc = ""
            for i, p in enumerate(w.split("/")):
                if p == "" and i == 0:
                    continue
                acc = f"{acc}/{p}"
                out.append(acc)
        return out

    def analyze_query_term(self, term: str) -> list[str]:
        """Query side matches the reference: a location.exact query term
        is ONE exact (case-sensitive) prefix term, not the expansion —
        the hierarchy expansion happens at index time only
        (Lucene.java:440-445; query via TermQuery on the stored
        prefix)."""
        term = term.strip()
        return [term] if term else []


class FileNameAnalyzer(_BaseAnalyzer):
    """``location.fileName`` semantics (Lucene.java:437-448 wiring with
    IcatSeparatorAnalyzer('.')): the substring after the last '/',
    split on '.', lowercased — so ``/a/b/report.final.pdf`` yields
    ``report``, ``final``, ``pdf``."""

    version = "filename-1"
    name = "filename"
    candidate_split = r"\s+"

    def tokens(self, text: str) -> list[str]:
        out: list[str] = []
        for w in text.split():
            base = w.rsplit("/", 1)[-1]
            out.extend(p.lower() for p in base.split(".") if p)
        return out


_REGISTRY = {
    "icat": IcatAnalyzer,
    "icat_synonym": IcatSynonymAnalyzer,
    "simple": SimpleAnalyzer,
    "path": SeparatorAnalyzer,
    "path_hierarchy": PathHierarchyAnalyzer,
    "filename": FileNameAnalyzer,
}


def get_analyzer(name: str):
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
