"""Corpus generator determinism + the per-row extractor invariant
(BASELINE.json input_hint: extracted text byte-identical per url)."""

import pyarrow as pa

from icat_lucene_ray.corpus import extract_batch, extract_text, generate_pages


def test_schema():
    t = generate_pages(10)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t["warc_ts"].type == pa.timestamp("us")
    assert t["html"].type == pa.binary()


def test_extractor_invariant_per_row():
    t = generate_pages(100)
    for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == x  # byte-identical


def test_extract_batch_stage():
    t = generate_pages(20)
    stripped = t.drop_columns(["text"])
    out = extract_batch(stripped)
    assert out["text"].to_pylist() == t["text"].to_pylist()


def test_chunked_generation_deterministic():
    whole = generate_pages(60)
    part = generate_pages(25, start_doc=20)
    assert part["text"].to_pylist() == whole["text"].to_pylist()[20:45]
    assert part["url"].to_pylist() == whole["url"].to_pylist()[20:45]


def test_zipf_head_skew():
    t = generate_pages(200, vocab_size=2000)
    from collections import Counter

    c = Counter()
    for x in t["text"].to_pylist():
        c.update(set(x.split()))
    top = c.most_common(1)[0][1]
    assert top > 100  # head term hits most docs -> skew exists
