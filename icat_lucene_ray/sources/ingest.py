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
import os
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
    (batch into ``IndexUpdater``, or persist with
    :func:`ingest_to_parquet` to feed ``build_index``, which reads
    parquet so doc ids can derive from file-row metadata)."""
    return ray.data.read_json(paths)


_INGEST_FMTS = ("jsonl", "csv", "wet", "parquet")


def _ingest_files(path: str | list[str], fmt: str) -> list[str]:
    exts = {"jsonl": (".jsonl", ".json", ".ndjson"),
            "csv": (".csv",), "parquet": (".parquet",),
            "wet": (".wet", ".wet.gz", ".warc.gz", ".warc")}[fmt]
    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out += [os.path.join(root, f) for f in files
                        if f.endswith(exts)]
        else:
            out.append(p)
    return sorted(out)


def ingest_to_parquet(
    input_path: str | list[str],
    out_dir: str,
    *,
    fmt: str = "jsonl",
    columns: list[str] | None = None,
    shards: int = 1,
    resume: bool = True,
) -> list[str]:
    """Convert a raw corpus (JSONL / CSV) to the partitioned parquet
    ``build_index`` consumes, one streaming Ray Data pass per shard —
    the web-dump ingest path (raw crawls arrive as newline-delimited
    JSON or CSV, while the index build wants parquet row-group
    metadata for dense doc-id assignment and pruned column reads;
    ≈ the reference's bulk-population ingest, ``Lucene.java:519-541``,
    re-expressed as a source conversion rather than a servlet POST).

    Scale design: ``read_json``/``read_csv`` → optional column
    projection → ``write_parquet``, never materialized; ``shards``
    splits the input FILE list into independently-converted,
    independently-resumable output directories (lineage marker per
    shard, same contract as Phase A's ``checkpoint_shards``), so a
    failed 100-TB ingest re-does only unfinished shards. Returns the
    flat list of produced parquet FILE paths (directory lists are not
    accepted by ``pyarrow.dataset``) — pass to ``build_index`` /
    ``curate`` / ``ray.data.read_parquet`` as-is.
    """
    if fmt not in _INGEST_FMTS:
        raise ValueError(f"unknown ingest format {fmt!r} "
                         f"(expected one of {_INGEST_FMTS})")
    files = _ingest_files(input_path, fmt)
    if not files:
        raise FileNotFoundError(f"no {fmt} files under {input_path!r}")
    if fmt == "parquet":  # already the build's native format
        return files
    shards = max(1, min(shards, len(files)))
    per = -(-len(files) // shards)
    out_dirs: list[str] = []
    for si in range(shards):
        shard_files = files[si * per:(si + 1) * per]
        if not shard_files:
            break
        shard_dir = os.path.join(out_dir, f"ingest_{si:05d}")
        marker = os.path.join(shard_dir, "_DONE.json")
        lin = _ingest_lineage(shard_files, fmt, columns)
        if resume and os.path.exists(marker):
            with open(marker) as f:
                if json.load(f).get("lineage") == lin:
                    out_dirs.append(shard_dir)
                    continue
        if os.path.exists(shard_dir):  # stale partial output
            import shutil

            shutil.rmtree(shard_dir)
        os.makedirs(shard_dir, exist_ok=True)
        if fmt == "jsonl":
            ds = ray.data.read_json(shard_files)
        elif fmt == "csv":
            ds = ray.data.read_csv(shard_files)
        else:  # wet
            ds = read_wet(shard_files)
        if columns:
            ds = ds.select_columns(columns)
        ds.write_parquet(shard_dir)
        with open(marker, "w") as f:
            json.dump({"lineage": lin, "files": len(shard_files)}, f)
        out_dirs.append(shard_dir)
    return [os.path.join(d, f) for d in out_dirs
            for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


def parse_wet_bytes(raw: bytes) -> "pa.Table":
    """Parse ONE WET/WARC file's bytes into the flagship pages schema
    ``(url:string, warc_ts:timestamp[us], text:string)``. WET is the
    Common Crawl text-extract distribution format (ISO 28500 WARC
    records of type ``conversion``): ``WARC/1.x`` header block,
    ``\\r\\n\\r\\n``, then exactly ``Content-Length`` bytes of payload
    — so the scanner JUMPS by Content-Length and never searches
    inside bodies (a body containing the literal ``WARC/1.0`` cannot
    desync it). Gzip members are handled whether the file is one
    stream or per-record members (both occur in the wild; stdlib
    ``gzip.decompress`` concatenates members). Non-conversion records
    (``warcinfo``, ``request``, ...) are skipped."""
    import gzip

    import pyarrow as pa
    import pyarrow.compute as pc

    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    urls: list[str] = []
    tss: list[str | None] = []
    texts: list[str] = []
    pos, n = 0, len(raw)
    while pos < n:
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        header = raw[pos:hdr_end]
        if not header.startswith(b"WARC/"):
            nxt = raw.find(b"\r\nWARC/", pos)  # resync on corrupt input
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        h: dict[bytes, bytes] = {}
        for line in header.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            h[k.strip().lower()] = v.strip()
        try:
            clen = int(h.get(b"content-length", b"0"))
        except ValueError:
            clen = 0
        body = raw[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        while raw[pos:pos + 2] == b"\r\n":
            pos += 2
        if h.get(b"warc-type") != b"conversion":
            continue
        urls.append(h.get(b"warc-target-uri", b"").decode("utf-8",
                                                          "replace"))
        d = h.get(b"warc-date")
        tss.append(d.decode("ascii", "replace") if d else None)
        texts.append(body.decode("utf-8", "replace"))
    try:
        ts = pc.strptime(pa.array(tss, pa.string()),
                         format="%Y-%m-%dT%H:%M:%SZ", unit="us")
    except pa.ArrowInvalid:  # malformed dates: keep rows, null the ts
        ts = pa.nulls(len(tss), pa.timestamp("us"))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "warc_ts": ts,
                     "text": pa.array(texts, pa.string())})


def _parse_wet_batch(batch: "pa.Table") -> "pa.Table":
    import pyarrow as pa

    parts = [parse_wet_bytes(b.as_py()) for b in batch["bytes"]]
    return pa.concat_tables(parts) if parts else parse_wet_bytes(b"")


def read_wet(paths: str | list[str]) -> ray.data.Dataset:
    """Stream WET/WARC files into a ``(url, warc_ts, text)`` Dataset —
    the exact flagship pages shape minus ``html``/``lang``. One parse
    task per file (CC WET files are ~150 MB gz; ``batch_size=1`` keeps
    a file's bytes in a single task's heap and parallelism = files)."""
    files = _ingest_files(paths, "wet")
    if not files:
        raise FileNotFoundError(f"no WET/WARC files under {paths!r}")
    return ray.data.read_binary_files(files).map_batches(
        _parse_wet_batch, batch_format="pyarrow", batch_size=1)


def _ingest_lineage(files: list[str], fmt: str,
                    columns: list[str] | None) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    for f in sorted(files):
        try:
            st = os.stat(f)
            h.update(f"{f}:{st.st_size}".encode())
        except OSError:
            h.update(f.encode())
    h.update(f"{fmt}:{sorted(columns) if columns else ''}".encode())
    return h.hexdigest()


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
