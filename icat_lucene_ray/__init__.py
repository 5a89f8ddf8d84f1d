"""icat_lucene_ray — a Ray-Data-native full-text indexing + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of
icatproject/icat.lucene (a Lucene 8 REST search server) as idiomatic
Ray Data pipelines:

- index build   = ``ray.data.read_parquet`` -> ``map_batches`` (tokenize,
  zero-copy Arrow) -> per-batch posting-run combiner -> one
  ``groupby(shard_key)`` shuffle -> immutable term-sharded segments
  (bit-packed delta-compressed postings with block-max metadata).
- query         = BM25 top-k (term / boolean AND-OR-NOT / phrase-lite /
  wildcard / range / filter), faceting, field sort, search_after
  pagination — over stateful segment-reader actors or inline readers.

The reference repo is cited throughout as ``Lucene.java:NNN`` etc. so
behavioral parity can be checked; no code is ported from it.
"""

__version__ = "0.1.0"

import logging as _logging


class _DropSchemaHashNoise(_logging.Filter):
    """Ray Data's schema-dedup fast path logs a harmless warning
    ('Failed to hash the schemas …') on every stage whose block schema
    isn't hashable, flooding build/bench logs. The slow path it falls
    back to is correct; drop just that message. Installed at package
    import so worker processes (which import this package to
    deserialize stage callables) are covered too."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_DropSchemaHashNoise())


class _DropEmptyBundleSchemaNoise(_logging.Filter):
    """groupby().map_groups stages whose reducer partitions come up
    empty emit zero-row RefBundles; the streaming executor then warns
    'RefBundle with a different schema ... new schema: .' (the empty
    schema) once per such bundle. The group fns all return
    consistently-typed (possibly empty) tables — only the no-schema
    variant of the warning is dropped, real schema drift still logs."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and "new schema: ." in msg)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_DropEmptyBundleSchemaNoise())

from icat_lucene_ray.config import EngineConfig  # noqa: F401
