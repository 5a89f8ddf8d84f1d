"""Query AST — the operator surface of the reference's query compiler.

Maps to ``SearchBucket``'s query tree (SURVEY.md §2.4):

- :class:`Term`        — Q1 term query (analyzed; synonym expansion may
                         fan a single input term into an OR of stems).
- :class:`And`/:class:`Or`/:class:`Not` — Q3 boolean MUST / SHOULD /
                         MUST_NOT trees (``SearchBucket.java:208-236``).
- :class:`Filter`/:class:`RangeFilter` — non-scoring FILTER clauses over
                         doc-store columns ≈ Occur.FILTER + Lucene
                         point-range queries (Q6/Q7/Q8,
                         ``SearchBucket.java:347-357,813-839``).
- :class:`Phrase`      — Q4 phrase-lite: positions are not indexed, so a
                         phrase evaluates as conjunction (documented
                         north_rule scope).
- :class:`Wildcard`    — Q5 prefix/wildcard; lowercased before matching
                         (M11, ``SearchBucket.java:171-194``), expanded
                         against the term dictionary.
- :class:`MatchAll`    — Q9 empty-query fallback
                         (``SearchBucket.java:636-642``), constant score 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class Term(Query):
    """``field=None`` targets the index's default text field. On a
    multi-field index the posting term is ``"{field}:{stem}"`` (M2
    field→physical expansion ≈ per-field Lucene terms,
    ``Field.java:51-72``)."""
    text: str
    field: str | None = None


@dataclass(frozen=True)
class Phrase(Query):
    """``slop`` (Lucene ``"a b"~N`` proximity) loosens exact adjacency
    to an IN-ORDER window: the phrase matches when occurrences
    q_0 < q_1 < ... exist with total stretch (q_last - q_0) - (n-1)
    <= slop (SpanNearQuery inOrder=true semantics — a documented
    divergence from Lucene's moves-based unordered sloppy matching,
    chosen because an independent SQL oracle can recompute it).
    slop=0 is exact adjacency. Requires a positions index."""
    terms: tuple[str, ...]
    field: str | None = None
    slop: int = 0

    def __init__(self, terms, field=None, slop=0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "slop", int(slop))


@dataclass(frozen=True)
class Wildcard(Query):
    pattern: str  # '*' any run, '?' one char; leading '*' allowed
    field: str | None = None


@dataclass(frozen=True)
class Regexp(Query):
    """Lucene RegexpQuery analog (``/pattern/`` via the reference's
    StandardQueryParser — the classic-parser syntax escapePath guards
    against, ``SearchBucket.java:200-204``): expands to every
    dictionary term the pattern FULL-matches (Lucene anchors regexps
    to the whole term), scored as the OR-sum of the expanded term
    queries exactly like :class:`Wildcard`. Pattern syntax is Python
    ``re`` (superset of Lucene's operators minus ``~``/``@``
    extensions)."""
    pattern: str
    field: str | None = None


@dataclass(frozen=True)
class Fuzzy(Query):
    """Lucene FuzzyQuery analog (``term~`` / ``term~1`` via the
    reference's StandardQueryParser surface,
    ``DocumentMapping.java:120-146``): expands to every dictionary term
    within ``max_edits`` edit distance, scored as the OR-sum of the
    expanded term queries exactly like :class:`Wildcard`. Distance is
    PLAIN Levenshtein (documented divergence: Lucene counts
    transpositions as one Damerau edit) so an independent SQL oracle
    can recompute the expansion with ``levenshtein()``."""
    text: str
    max_edits: int = 2
    field: str | None = None


@dataclass(frozen=True)
class And(Query):
    clauses: tuple
    filters: tuple = ()

    def __init__(self, clauses, filters=()):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(self, "filters", tuple(filters))


@dataclass(frozen=True)
class Or(Query):
    """SHOULD disjunction; score = sum of matching clause scores.

    ``min_should`` is Lucene's
    ``BooleanQuery.Builder.setMinimumNumberShouldMatch``: a document
    qualifies only when at least that many SHOULD clauses match it
    (each clause counts at most once per doc). 1 is plain OR."""
    clauses: tuple
    min_should: int = 1

    def __init__(self, clauses, min_should=1):
        object.__setattr__(self, "clauses", tuple(clauses))
        m = int(min_should)
        if m < 1:
            raise ValueError("min_should must be >= 1")
        object.__setattr__(self, "min_should", m)


@dataclass(frozen=True)
class DisMax(Query):
    """Lucene ``DisjunctionMaxQuery``: a doc matching any clause scores
    ``max(clause scores) + tie * (sum of the other matching clause
    scores)``. The classic "best field wins" combiner for multi-field
    search — unlike :class:`Or`, matching many clauses weakly does not
    outrank matching one strongly. Non-scoring clauses (Filter/Range)
    contribute constant 1.0, mirroring the engine's Or semantics."""
    clauses: tuple
    tie: float = 0.0

    def __init__(self, clauses, tie=0.0):
        object.__setattr__(self, "clauses", tuple(clauses))
        t = float(tie)
        if not 0.0 <= t <= 1.0:
            raise ValueError("tie must be in [0, 1]")
        object.__setattr__(self, "tie", t)


@dataclass(frozen=True)
class Not(Query):
    positive: Query
    negative: Query


@dataclass(frozen=True)
class Filter(Query):
    """Non-scoring exact / set-membership predicate on a doc-store column
    (string equality or IN-list; Q7/Q8)."""
    field_name: str
    values: tuple

    def __init__(self, field_name, values):
        object.__setattr__(self, "field_name", field_name)
        vals = (values,) if isinstance(values, (str, int, float)) else tuple(values)
        object.__setattr__(self, "values", vals)


@dataclass(frozen=True)
class RangeFilter(Query):
    """Non-scoring numeric/timestamp range (half-open supported via None
    bounds, mirroring ``SearchBucket.java:347-357`` MIN/MAX defaults)."""
    field_name: str
    lo: object = None
    hi: object = None
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class Boost(Query):
    """Lucene MUST + SHOULD semantics: documents must match ``required``;
    ``optional``'s score is ADDED where it also matches but does not
    constrain the result set (BooleanQuery SHOULD-beside-MUST,
    ``SearchBucket.java:208-236``)."""
    required: Query
    optional: Query


@dataclass(frozen=True)
class Weight(Query):
    """Lucene inline boost (``term^2`` / ``"phrase"^1.5`` via
    StandardQueryParser): multiplies the wrapped query's scores by
    ``factor``. Matching set is unchanged."""
    query: Query
    factor: float


@dataclass(frozen=True)
class MatchAll(Query):
    pass
