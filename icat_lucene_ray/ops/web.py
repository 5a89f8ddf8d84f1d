"""Web-corpus operators: URL canonicalization, host aggregation and
URL-level dedup for Common-Crawl-style page tables.

All stages are stateless ``map_batches`` transforms over zero-copy
Arrow batches using RE2 kernels (``pyarrow.compute`` regex functions),
so the same regexes run verbatim in a DuckDB oracle
(``regexp_replace`` / ``regexp_extract`` are RE2 there too — no
lookarounds anywhere). The canonical form, in order:

1. drop the fragment (``#...``),
2. lowercase the scheme://host[:port] prefix (path/query unchanged —
   paths are case-sensitive),
3. strip a leading ``www.`` host label,
4. strip explicit default ports ``:80`` / ``:443``,
5. strip one trailing ``/``.

Crawl pipelines dedup fetch queues and page stores by this form; the
reference engine has no web layer (its ids are ICAT entity ids), so
this module is brief-mandated training-data tooling, not parity
(cf. SURVEY.md "beyond the reference" ops).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: scheme://authority prefix (everything before the first / or ?)
_PREFIX_RE = r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(?P<r>.*)$"
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<h>[^/:?#]+)"


def _replace(arr: pa.ChunkedArray | pa.Array, pat: str, repl: str):
    return pc.replace_substring_regex(arr, pattern=pat, replacement=repl)


def canonicalize_url_batch(batch: pa.Table, col: str = "url",
                           out: str = "canon_url") -> pa.Table:
    """Append the canonical form of ``col`` (vectorized RE2 kernels)."""
    x = _replace(batch[col], r"#.*$", "")
    pre = pc.extract_regex(x, _PREFIX_RE)
    rest = pc.extract_regex(x, _REST_RE)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(pre, 0)), pc.struct_field(rest, 0), "")
    # URLs without a scheme://authority prefix pass through unchanged
    x = pc.if_else(pc.is_valid(pre), lowered, x)
    x = _replace(x, r"://www\.", "://")
    x = _replace(x, r"(://[^/:?]+):(?:80|443)($|[/?])", r"\1\2")
    x = _replace(x, r"/$", "")
    return batch.append_column(out, x)


def extract_host_batch(batch: pa.Table, col: str = "canon_url",
                       out: str = "host") -> pa.Table:
    """Append the host of an already-canonical URL."""
    h = pc.struct_field(pc.extract_regex(batch[col], _HOST_RE), 0)
    return batch.append_column(out, h)


def canonicalize_urls(ds, col: str = "url", out: str = "canon_url",
                      with_host: bool = False):
    """Dataset wrapper: append canonical URL (and optionally host)."""
    ds = ds.map_batches(lambda b: canonicalize_url_batch(b, col, out),
                        batch_format="pyarrow")
    if with_host:
        ds = ds.map_batches(lambda b: extract_host_batch(b, out),
                            batch_format="pyarrow")
    return ds


def host_doc_counts(ds, url_col: str = "url", k: int | None = None):
    """Docs per host, optionally top-k (count desc, host asc).

    Scale path: the per-batch combiner collapses each input block to
    ≤(distinct hosts in block) rows before the small ``groupby`` —
    the shuffle moves per-block host counts, never per-doc rows.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        b = canonicalize_url_batch(batch.select([url_col]), url_col, "c")
        b = extract_host_batch(b, "c")
        g = pa.TableGroupBy(b.select(["host"]), "host").aggregate(
            [([], "count_all")])
        return pa.table({"host": g["host"],
                         "doc_count": g["count_all"].cast(pa.int64())})

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
            .groupby("host").sum("doc_count")
    agg = agg.map_batches(
        lambda b: b.rename_columns(["host", "doc_count"]),
        batch_format="pyarrow")
    if k is not None:
        agg = agg.sort(["doc_count", "host"],
                       descending=[True, False]).limit(k)
    return agg


def dedup_by_url(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Keep ONE doc per canonical URL (the smallest id — deterministic).

    Hash-partitioned ``groupby(canon).min(id)``: the shuffle key is the
    canonical URL, so each group lands whole on one reducer; no driver
    state, no pair lists — the same shape as exact text dedup
    (``ops/dedup.py``) with the canonical form as the key.
    """
    keyed = ds.map_batches(
        lambda b: canonicalize_url_batch(
            b.select([id_col, url_col]), url_col, "canon_url")
        .select(["canon_url", id_col]),
        batch_format="pyarrow")
    kept = keyed.groupby("canon_url").min(id_col)
    return kept.map_batches(
        lambda b: pa.table({id_col: b[f"min({id_col})"]}),
        batch_format="pyarrow")
