"""URL canonicalization / host aggregation / URL dedup (ops/web.py)
and repetition metrics (ops/text.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.ops.web import (
    canonicalize_url_batch,
    canonicalize_urls,
    dedup_by_url,
    extract_host_batch,
    host_doc_counts,
)
from icat_lucene_ray.ops.text import (
    add_repetition_metrics,
    redact_pii,
    unigram_logprob,
)


def _canon(urls: list[str]) -> list[str]:
    t = pa.table({"url": pa.array(urls, pa.string())})
    return canonicalize_url_batch(t)["canon_url"].to_pylist()


def test_canonical_form_rules():
    assert _canon(["HTTPS://WWW.Host.COM:443/Path/#frag"]) == \
        ["https://host.com/Path"]
    # path/query case is preserved; only scheme+authority is lowered
    assert _canon(["HTTP://A.B:80/KeepCase?Q=Mixed"]) == \
        ["http://a.b/KeepCase?Q=Mixed"]
    # non-default port survives
    assert _canon(["https://h.io:8080/x/"]) == ["https://h.io:8080/x"]
    # www only stripped as a host prefix label
    assert _canon(["https://wwwish.com/a", "https://www.x.org/a"]) == \
        ["https://wwwish.com/a", "https://x.org/a"]
    # :443 inside the path is untouched
    assert _canon(["https://h.io/p:443/q"]) == ["https://h.io/p:443/q"]
    # no scheme -> passthrough (modulo trailing slash)
    assert _canon(["not a url/"]) == ["not a url"]


def test_extract_host():
    t = pa.table({"canon_url": pa.array(
        ["https://a.b.c/x", "http://h.io:8080/y", "plain"])})
    assert extract_host_batch(t)["host"].to_pylist() == \
        ["a.b.c", "h.io", None]


@pytest.fixture()
def url_ds(ray_session):
    import ray.data

    rows = {
        "doc_id": list(range(6)),
        "url": [
            "HTTPS://WWW.One.COM/a/",     # -> https://one.com/a
            "https://one.com/a",          # dup of 0
            "https://one.com/a#frag",     # dup of 0
            "https://two.com:443/b",      # -> https://two.com/b
            "https://two.com/b",          # dup of 3
            "https://three.com/c",
        ],
    }
    return ray.data.from_arrow(pa.table(rows))


def test_dedup_by_url_keeps_min_id(url_ds):
    kept = sorted(dedup_by_url(url_ds)
                  .to_pandas()["doc_id"].astype(int).tolist())
    assert kept == [0, 3, 5]


def test_host_doc_counts_topk(url_ds):
    t = host_doc_counts(url_ds, "url", k=2).to_pandas()
    assert t["host"].tolist() == ["one.com", "two.com"]
    assert t["doc_count"].tolist() == [3, 2]


def test_canonicalize_urls_dataset(url_ds):
    out = canonicalize_urls(url_ds, with_host=True).to_pandas()
    assert out.loc[out.doc_id == 0, "canon_url"].item() == "https://one.com/a"
    assert out.loc[out.doc_id == 3, "host"].item() == "two.com"


def test_repetition_metrics_exact():
    t = pa.table({"text": pa.array([
        "a b a b c",      # 3 distinct / 5 words; 'a b' twice of 4 bigrams
        "x x x",          # 1 distinct / 3; 'x x' 2 of 2
        "unique words only",
        "solo",           # no bigrams
    ])})
    r = add_repetition_metrics(t)
    dup = r["dup_word_frac"].to_pylist()
    top = r["top_bigram_frac"].to_pylist()
    assert dup == pytest.approx([1 - 3 / 5, 1 - 1 / 3, 0.0, 0.0], abs=1e-6)
    assert top == pytest.approx([2 / 4, 1.0, 1 / 2, 0.0], abs=1e-6)


def test_redact_pii():
    t = pa.table({"text": pa.array([
        "mail a.b+c@x-y.io and a.b+c@x-y.io twice",
        "ssn 123-45-6789 phone 123-555-0199 ip 10.0.0.255",
        "clean text 123-45-678 (too short) 1.2.3 (not ip)",
        "v4 999.999.999.999 still matches the shape rule",
    ])})
    r = redact_pii(t)
    out = r["clean_text"].to_pylist()
    assert out[0] == "mail <EMAIL> and <EMAIL> twice"
    assert out[1] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert out[2] == "clean text 123-45-678 (too short) 1.2.3 (not ip)"
    assert out[3] == "v4 <IP> still matches the shape rule"
    assert r["n_pii"].to_pylist() == [2, 3, 0, 1]


def test_redact_pii_email_digits_not_phone():
    # digits inside an email local-part must not leak a <PHONE> tag
    t = pa.table({"text": pa.array(["reach 123-555-0199@ex.com today"])})
    r = redact_pii(t)
    assert r["clean_text"].to_pylist() == ["reach <EMAIL> today"]
    assert r["n_pii"].to_pylist() == [1]


def test_repetition_metrics_batch_boundaries():
    # last word of doc i and first of doc i+1 must NOT pair up
    t = pa.table({"text": pa.array(["p q", "q p"])})
    r = add_repetition_metrics(t)
    assert r["top_bigram_frac"].to_pylist() == [1.0, 1.0]
    assert r["dup_word_frac"].to_pylist() == [0.0, 0.0]


def test_unigram_logprob_hand_computed(ray_session):
    import math

    import ray.data

    # corpus: a a a b b c  -> total 6; model (min_count=2): a:3 b:2;
    # c is OOV -> 0.5 count
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a a b", "b c"]),
    }))
    out = unigram_logprob(ds, min_count=2).to_pandas() \
        .sort_values("doc_id")
    d0 = (3 * -math.log2(3 / 6) + -math.log2(2 / 6)) / 4
    d1 = (-math.log2(2 / 6) + -math.log2(0.5 / 6)) / 2
    assert out["bits_per_word"].tolist() == pytest.approx(
        [round(d0, 6), round(d1, 6)], abs=1e-6)


def test_top_tfidf_terms_bruteforce(ray_session):
    """Per-doc top-k TF-IDF vs a scalar reference, with exact score
    ties exercising the term tie-break."""
    import math

    import pyarrow as pa
    import ray

    from icat_lucene_ray.ops.text import top_tfidf_terms

    texts = [
        "apple banana apple cherry",       # tf tie banana/cherry
        "banana cherry cherry date",
        "apple apple apple apple",
        "date egg egg fig fig",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = top_tfidf_terms(ds, k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)

    n = len(texts)
    df = {}
    for t in texts:
        for w in set(t.split(" ")):
            df[w] = df.get(w, 0) + 1
    for d, t in enumerate(texts):
        tf = {}
        for w in t.split(" "):
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(((w, c * math.log(n / df[w])) for w, c in tf.items()),
                        key=lambda x: (-x[1], x[0]))[:2]
        sub = got[got["doc_id"] == d]
        assert sub["term"].tolist() == [w for w, _ in scored], d
        for (w, s), gs in zip(scored, sub["score"]):
            assert round(s, 6) == gs, (d, w)
