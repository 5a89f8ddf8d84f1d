from icat_lucene_ray.query.ast import (  # noqa: F401
    And, Boost, DisMax, Filter, Fuzzy, MatchAll, Not, Or, Phrase,
    RangeFilter, Regexp, Term, Weight, Wildcard,
)
from icat_lucene_ray.query.engine import Index, SearchResult  # noqa: F401
from icat_lucene_ray.query.oracle import OracleIndex  # noqa: F401
from icat_lucene_ray.query.parser import QueryParseError, parse_query  # noqa: F401
