"""Deterministic synthetic Common-Crawl-style page corpus + extractor.

Produces the exact input schema from ``BASELINE.json`` input_hint::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

- Zipfian vocabulary (s≈1.07 over ~50k pseudo-word stems) → realistic
  head-term skew for salting tests (FIXTURES.md §1).
- Doc length ~ clipped lognormal (20..2000 tokens).
- ``html`` deterministically wraps ``text`` so the extractor invariant
  is checkable: ``extract_text(html) == text`` byte-identical per url.
- Everything is seeded per doc index: ``generate_pages(n, seed)`` is
  reproducible regardless of chunking/parallelism.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]
_PARA_TOKENS = 50

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def make_vocab(size: int = 50_000, seed: int = 7) -> list[str]:
    """Pronounceable pseudo-words, deterministic, no stop-word collisions."""
    rng = np.random.default_rng(seed)
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < size:
        k = rng.integers(2, 5)
        w = "".join(
            _CONS[rng.integers(len(_CONS))] + _VOW[rng.integers(len(_VOW))]
            for _ in range(int(k))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _zipf_cdf(size: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), s)
    p /= p.sum()
    return np.cumsum(p)


def generate_pages(
    n_docs: int,
    *,
    seed: int = 42,
    vocab_size: int = 50_000,
    zipf_s: float = 1.07,
    n_hosts: int = 100,
    start_doc: int = 0,
) -> pa.Table:
    """Generate ``n_docs`` pages. ``start_doc`` offsets the doc index so
    large corpora can be generated in chunks while staying deterministic
    (chunk i of size c == rows [i*c, (i+1)*c) of one big call)."""
    vocab = np.array(make_vocab(vocab_size), dtype=object)
    cdf = _zipf_cdf(vocab_size, zipf_s)

    urls: list[str] = []
    texts: list[str] = []
    htmls: list[bytes] = []
    langs: list[str] = []
    ts = np.empty(n_docs, dtype=np.int64)

    for i in range(n_docs):
        di = start_doc + i
        rng = np.random.default_rng((seed, di))
        dl = int(np.clip(rng.lognormal(mean=5.0, sigma=0.9), 20, 2000))
        toks = vocab[np.searchsorted(cdf, rng.random(dl))]
        text = " ".join(toks)
        host = di % n_hosts
        url = f"https://host{host:03d}.example/p/{di}"
        lang = _LANGS[int(rng.integers(len(_LANGS)))]
        paras = [
            " ".join(toks[j:j + _PARA_TOKENS])
            for j in range(0, dl, _PARA_TOKENS)
        ]
        body = "".join(f"<p>{p}</p>" for p in paras)
        html = (
            f"<html><head><title>doc {di}</title></head>"
            f"<body>{body}</body></html>"
        ).encode("utf-8")
        urls.append(url)
        texts.append(text)
        htmls.append(html)
        langs.append(lang)
        ts[i] = _EPOCH_US + di * 60_000_000  # one page per simulated minute

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages(
    out_dir: str,
    n_docs: int,
    *,
    rows_per_file: int = 10_000,
    seed: int = 42,
    **kw,
) -> list[str]:
    """Write a paged corpus as multiple parquet files (scale via chunks)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_docs, rows_per_file):
        n = min(rows_per_file, n_docs - start)
        t = generate_pages(n, seed=seed, start_doc=start, **kw)
        p = os.path.join(out_dir, f"pages_{start // rows_per_file:05d}.parquet")
        pq.write_table(t, p, compression="zstd")
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# Extraction (html -> text), per-row invariant: byte-identical to `text`
# ---------------------------------------------------------------------------

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def extract_text(html: bytes) -> str:
    """Extract body text from our deterministic page HTML.

    The invariant (input_hint): for every url,
    ``extract_text(html) == text`` exactly. Paragraph contents are
    joined with a single space — the inverse of the generator's layout.
    """
    paras = _P_RE.findall(html)
    return b" ".join(paras).decode("utf-8")


def extract_batch(batch: pa.Table, html_col: str = "html",
                  out_col: str = "text") -> pa.Table:
    """``map_batches`` stage: derive the text column from html."""
    texts = [extract_text(h) for h in batch[html_col].to_pylist()]
    arr = pa.array(texts, pa.string())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, arr)
