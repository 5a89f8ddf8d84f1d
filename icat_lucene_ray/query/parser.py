"""Free-text query-string parser (Q2).

Compiles user query strings into the engine AST, mirroring the
reference's ``StandardQueryParser`` surface over per-entity default
field lists (``SearchBucket.java:217-222,250-255,283-298``; field lists
``DocumentMapping.java:120-146``):

- bare terms search every default field (a multi-field index ORs the
  per-field term queries, like Lucene's multi-field parse);
- ``field:term``, ``field:"a phrase"`` and ``field:(sub query)`` scope
  a clause to one field;
- ``"quoted phrases"`` → :class:`Phrase` (phrase-lite per north_rule);
- ``*`` / ``?`` in a term → :class:`Wildcard` (lowercased by the
  engine, M11);
- trailing ``~`` / ``~N`` → :class:`Fuzzy` (edit-distance expansion
  against the term dictionary, N capped at Lucene's 2);
- ``/pattern/`` → :class:`Regexp` (dictionary expansion, full-match
  anchored like Lucene RegexpQuery; ``\\/`` escapes a slash);
- ``term^2`` / ``"phrase"^1.5`` → :class:`Weight` (score multiplier);
- ``field:[lo TO hi]`` / ``field:{lo TO hi}`` → :class:`RangeFilter`
  (inclusive / exclusive bounds, ``*`` = open);
- ``AND`` binds tighter than ``OR``; bare adjacency is ``OR`` (the
  Lucene default operator); ``NOT x`` / ``-x`` are MUST_NOT and ``+x``
  is MUST within their group.

Boolean mapping (documented simplifications vs Lucene):

- a group with MUST and SHOULD clauses compiles to
  ``Boost(And(must), Or(should))`` — exact Lucene semantics (SHOULD
  beside MUST scores but does not constrain);
- a group with only MUST_NOT matches nothing but the exclusions'
  complement: ``Not(MatchAll(), Or(nots))``;
- operator keywords are case-sensitive uppercase (Lucene classic).
"""

from __future__ import annotations

import re

from icat_lucene_ray.query.ast import (
    And, Boost, Fuzzy, MatchAll, Not, Or, Phrase, Query, Term, Wildcard,
)

#: trailing ``~`` / ``~N`` marks a fuzzy term (Lucene StandardQueryParser
#: syntax); Lucene caps maxEdits at 2 and rejects larger values loudly
#: (FuzzyQuery ctor IllegalArgumentException) — so do we, at parse time
_FUZZY_RE = re.compile(r"^(.+?)~([0-9]+)?$")


class QueryParseError(ValueError):
    pass


def escape_path(query: str) -> str:
    """M10 ``SearchBucket.escapePath`` (``SearchBucket.java:200-204``):
    escape every unescaped ``/`` so path-like terms survive query
    parsing (Lucene's classic parser treats ``/.../`` as a regex; ours
    strips the escapes back out in :func:`_unescape_term`, so escaped
    input always parses to the literal path term)."""
    return re.sub(r"\\?/", r"\\/", query)


def _unescape_term(term: str) -> str:
    return term.replace("\\/", "/")


_SCANNER = re.compile(
    r"""\s*(?:
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<range>[\[{]\s*\S+\s+TO\s+\S+\s*[\]}](?:\^[0-9.]+)?)
  | (?P<regex>/(?:[^/\\]|\\.)+/(?:\^[0-9.]+)?)
  | (?P<quoted>"[^"]*"(?:~[0-9]+)?(?:\^[0-9.]+)?)
  | (?P<kw_and>AND\b)
  | (?P<kw_or>OR\b)
  | (?P<kw_not>NOT\b)
  | (?P<plus>\+(?=\S))
  | (?P<minus>-(?=\S))
  | (?P<field>[A-Za-z_][\w.]*:)
  | (?P<term>[^\s()"]+)
    )""",
    re.VERBOSE,
)

_BOOST_RE = re.compile(r"^(.*?)\^([0-9]*\.?[0-9]+)$", re.DOTALL)


def _split_boost(tok: str) -> tuple[str, float | None]:
    """Strip a trailing Lucene ``^weight`` from a token."""
    m = _BOOST_RE.match(tok)
    return (m.group(1), float(m.group(2))) if m else (tok, None)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _SCANNER.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise QueryParseError(f"cannot tokenize at {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind is None:  # pure whitespace tail
            break
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]],
                 default_fields: list[str] | None):
        self.toks = tokens
        self.i = 0
        self.fields = list(default_fields) if default_fields else [None]

    # -- token helpers --------------------------------------------------
    def _peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # -- grammar ---------------------------------------------------------
    def parse(self) -> Query:
        q = self._or_expr(self.fields)
        if self.i != len(self.toks):
            raise QueryParseError(
                f"unexpected {self.toks[self.i][1]!r} at position {self.i}")
        return q

    def _or_expr(self, fields) -> Query:
        """(occur, query) clause group — adjacency or OR separated."""
        clauses: list[tuple[str, Query]] = [self._and_chain(fields)]
        while True:
            k = self._peek()
            if k == "kw_or":
                self._next()
                clauses.append(self._and_chain(fields))
            elif k in ("lparen", "quoted", "regex", "kw_not", "plus",
                       "minus", "field", "term"):
                clauses.append(self._and_chain(fields))
            else:
                break
        return _build_group(clauses)

    def _and_chain(self, fields) -> tuple[str, Query]:
        """clause (AND clause)*; an explicit-AND chain is one composite
        SHOULD clause of the enclosing OR group."""
        first = self._clause(fields)
        if self._peek() != "kw_and":
            return first
        members = [first]
        while self._peek() == "kw_and":
            self._next()
            members.append(self._clause(fields))
        # inside an AND chain: unprefixed = MUST, '-'/NOT = MUST_NOT
        promoted = [("must" if oc == "should" else oc, q)
                    for oc, q in members]
        return ("should", _build_group(promoted))

    def _clause(self, fields) -> tuple[str, Query]:
        k = self._peek()
        if k in ("kw_not", "minus"):
            self._next()
            _occ, q = self._clause(fields)
            return ("must_not", q)
        if k == "plus":
            self._next()
            _occ, q = self._clause(fields)
            return ("must", q)
        return ("should", self._primary(fields))

    def _primary(self, fields) -> Query:
        k = self._peek()
        if k is None:
            raise QueryParseError("unexpected end of query")
        if k == "lparen":
            self._next()
            q = self._or_expr(fields)
            if self._peek() != "rparen":
                raise QueryParseError("missing ')'")
            self._next()
            return q
        if k == "field":
            _, tok = self._next()
            field = tok[:-1]
            nxt = self._peek()
            if nxt == "lparen":  # field:(sub query) pushes field scope
                self._next()
                q = self._or_expr([field])
                if self._peek() != "rparen":
                    raise QueryParseError("missing ')'")
                self._next()
                return q
            if nxt == "range":  # field:[lo TO hi] / {lo TO hi}
                return self._range(field)
            return self._atom([field])
        if k == "range":
            raise QueryParseError("range needs a field: 'field:[a TO b]'")
        if k in ("quoted", "term", "regex"):
            return self._atom(fields)
        raise QueryParseError(f"unexpected {self.toks[self.i][1]!r}")

    def _range(self, field: str) -> Query:
        """Lucene range syntax: ``[`` / ``]`` inclusive, ``{`` / ``}``
        exclusive, ``*`` for an open bound. Numeric bounds (the engine's
        RangeFilter is numeric/timestamp); a trailing ^boost parses but
        is dropped — ranges are non-scoring FILTER clauses."""
        from icat_lucene_ray.query.ast import RangeFilter

        _, rtok = self._next()
        rtok, _boost = _split_boost(rtok)
        include_lo, include_hi = rtok[0] == "[", rtok[-1] == "]"
        parts = re.split(r"\s+TO\s+", rtok[1:-1].strip())
        if len(parts) != 2:
            raise QueryParseError(f"bad range {rtok!r}")

        def _bound(s: str):
            if s == "*":
                return None
            try:
                return int(s)
            except ValueError:
                try:
                    return float(s)
                except ValueError:
                    raise QueryParseError(
                        f"range bound {s!r} is not numeric or '*'")

        return RangeFilter(field, _bound(parts[0]), _bound(parts[1]),
                           include_lo=include_lo, include_hi=include_hi)

    def _atom(self, fields) -> Query:
        if self._peek() is None:
            raise QueryParseError("unexpected end of query (dangling "
                                  "'field:' or operator)")
        k, tok = self._next()
        weight = None
        if k == "regex":
            from icat_lucene_ray.query.ast import Regexp

            tok, weight = _split_boost(tok)
            pat = tok[1:-1].replace("\\/", "/")  # strip slashes, unescape
            try:
                re.compile(pat)
            except re.error as e:
                raise QueryParseError(f"bad regexp /{pat}/: {e}")
            per: list[Query] = [Regexp(pat, field=f) for f in fields]
        elif k == "quoted":
            tok, weight = _split_boost(tok)
            slop = 0
            m = re.match(r'^(".*")~([0-9]+)$', tok, re.DOTALL)
            if m:  # "a b"~N proximity (slop)
                tok, slop = m.group(1), int(m.group(2))
            words = tok[1:-1].split()
            per = [Phrase(words, field=f, slop=slop) if len(words) != 1
                   else Term(words[0], field=f) for f in fields]
        elif k == "term":
            tok, weight = _split_boost(_unescape_term(tok))
            fz = _FUZZY_RE.match(tok)
            if fz:
                base, edits = fz.group(1), int(fz.group(2) or 2)
                if edits > 2:
                    raise QueryParseError(
                        f"fuzzy maxEdits must be 0-2, got {edits} "
                        f"in {tok!r} (Lucene FuzzyQuery limit)")
                per = [Fuzzy(base, max_edits=edits, field=f)
                       for f in fields]
            elif "*" in tok or "?" in tok:
                per = [Wildcard(tok, field=f) for f in fields]
            else:
                per = [Term(tok, field=f) for f in fields]
        else:
            raise QueryParseError(f"expected a term, got {tok!r}")
        q = per[0] if len(per) == 1 else Or(per)
        if weight is not None:
            from icat_lucene_ray.query.ast import Weight

            q = Weight(q, weight)
        return q


def _build_group(clauses: list[tuple[str, Query]]) -> Query:
    must = [q for oc, q in clauses if oc == "must"]
    nots = [q for oc, q in clauses if oc == "must_not"]
    should = [q for oc, q in clauses if oc == "should"]
    if must and should:
        pos: Query = Boost(_all_of(must), _any_of(should))
    elif must:
        pos = _all_of(must)
    elif should:
        pos = _any_of(should)
    else:  # pure negation: everything except the exclusions
        pos = MatchAll()
    if nots:
        return Not(pos, _any_of(nots))
    return pos


def _all_of(qs: list[Query]) -> Query:
    from icat_lucene_ray.query.ast import Filter, RangeFilter

    if len(qs) == 1:
        return qs[0]
    scored = [q for q in qs if not isinstance(q, (Filter, RangeFilter))]
    filters = [q for q in qs if isinstance(q, (Filter, RangeFilter))]
    return And(scored, filters=filters)


def _any_of(qs: list[Query]) -> Query:
    return qs[0] if len(qs) == 1 else Or(qs)


def parse_query(s: str, *, default_fields: list[str] | None = None) -> Query:
    """Parse a user query string into the engine AST. ``default_fields``
    is the index's searched-field list (None → the index default field);
    empty / all-whitespace input compiles to MatchAll, as the reference
    maps a missing query body to match-all (``SearchBucket.java:636-642``).
    """
    tokens = _tokenize(s or "")
    if not tokens:
        return MatchAll()
    return _Parser(tokens, default_fields).parse()
