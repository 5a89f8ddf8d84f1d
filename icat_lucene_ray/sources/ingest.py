"""Input sources — the reference's ingest surfaces, Ray-Data-first.

- :func:`read_modify_ops` parses the reference's ``POST /modify``
  payload shape (an array of ``{create|update|delete: ...}`` objects,
  ``Lucene.java:487-506``) for :class:`IndexUpdater.modify`.
- :func:`docs_dataset_from_jsonl` is the bulk-population path
  (``addNow``, ``Lucene.java:519-541``) at scale: newline-delimited
  JSON documents stream in as a ``ray.data.Dataset`` feeding
  ``build_index``.
- :func:`pages_dataset` reads the CC-style parquet pages table
  (input_hint schema ``url, warc_ts, html, text, lang``), optionally
  re-extracting ``text`` from ``html`` (byte-identical per-url
  invariant; ``corpus.extract_batch``).
"""

from __future__ import annotations

import json
from typing import IO

import ray.data

_OP_KEYS = frozenset({"create", "update", "delete"})


def read_modify_ops(src: str | IO) -> list[dict]:
    """Parse and validate a reference-shaped modify op array."""
    if isinstance(src, str):
        with open(src) as f:
            ops = json.load(f)
    else:
        ops = json.load(src)
    if not isinstance(ops, list):
        raise ValueError("modify payload must be a JSON array of ops")
    for i, op in enumerate(ops):
        if not isinstance(op, dict) or len(op) != 1 \
                or next(iter(op)) not in _OP_KEYS:
            raise ValueError(
                f"op {i}: expected one of {sorted(_OP_KEYS)}, got {op!r}")
        kind = next(iter(op))
        if kind == "delete":
            if not isinstance(op["delete"], int):
                raise ValueError(f"op {i}: delete takes an int doc id")
        elif not isinstance(op[kind], dict):
            raise ValueError(f"op {i}: {kind} takes a document object")
    return ops


def docs_dataset_from_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """Bulk-population source: newline-delimited JSON docs → Dataset
    (feed to ``build_index`` or batch into ``IndexUpdater``)."""
    return ray.data.read_json(paths)


def pages_dataset(path: str | list[str], *, extract: bool = False,
                  columns: list[str] | None = None) -> ray.data.Dataset:
    """CC-style pages parquet source. With ``extract=True`` the ``text``
    column is re-derived from ``html`` via the deterministic extractor
    (checkable per-row invariant: byte-identical to the stored text)."""
    if extract:
        from icat_lucene_ray.corpus import extract_batch

        ds = ray.data.read_parquet(path)
        return ds.map_batches(extract_batch, batch_format="pyarrow")
    return ray.data.read_parquet(path, columns=columns)
