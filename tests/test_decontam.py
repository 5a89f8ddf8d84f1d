"""Benchmark n-gram decontamination vs a brute-force Python oracle
(training-data op family — no reference parity; SURVEY.md "beyond the
reference")."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray

from icat_lucene_ray.ops.decontam import (
    benchmark_ngram_set, decontaminate, ngram_contamination)


def _shingles(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"\s+", text) if t]
    if len(toks) <= n:
        return {"\x1f".join(toks)}
    return {"\x1f".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


TRAIN = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox naps all day",          # shares a 4-gram w/ bench
    "short doc",                                  # < n tokens
    "",                                           # empty
    "quick brown fox jumps quick brown fox jumps",  # repeated shingles
]
BENCH = [
    "watch the quick brown fox jumps over hills",
    "tiny",
]


@pytest.fixture(scope="module")
def flagged(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TRAIN)), pa.int64()),
        "text": pa.array(TRAIN, pa.string())}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(BENCH)), pa.int64()),
        "text": pa.array(BENCH, pa.string())}))
    out = ngram_contamination(ds, bench, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    return out


def test_counts_match_bruteforce(flagged):
    bench_set = set().union(*(_shingles(t, 4) for t in BENCH))
    for i, text in enumerate(TRAIN):
        sh = _shingles(text, 4)
        row = flagged.iloc[i]
        assert row["n_ngrams"] == len(sh), (i, text)
        assert row["n_hits"] == len(sh & bench_set), (i, text)
        assert bool(row["contaminated"]) == (len(sh & bench_set) >= 1)


def test_repeated_shingles_counted_once(flagged):
    # doc 5 repeats its windows; distinct count must dedup them
    sh = _shingles(TRAIN[5], 4)
    assert flagged.iloc[5]["n_ngrams"] == len(sh)


def test_decontaminate_drops_flagged(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TRAIN)), pa.int64()),
        "text": pa.array(TRAIN, pa.string())}))
    kept = decontaminate(ds, list(BENCH), n=4).to_pandas()
    bench_set = set().union(*(_shingles(t, 4) for t in BENCH))
    want = [i for i, t in enumerate(TRAIN) if not (_shingles(t, 4) & bench_set)]
    assert sorted(kept["doc_id"].tolist()) == want


def test_bench_set_forms(ray_session):
    """Dataset / list / precomputed-array benchmark inputs agree."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TRAIN)), pa.int64()),
        "text": pa.array(TRAIN, pa.string())}))
    bench_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(BENCH)), pa.int64()),
        "text": pa.array(BENCH, pa.string())}))
    a = ngram_contamination(ds, bench_ds, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = ngram_contamination(ds, list(BENCH), n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    arr = benchmark_ngram_set(bench_ds, n=4)
    c = ngram_contamination(ds, arr, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for other in (b, c):
        assert (a["n_hits"] == other["n_hits"]).all()
        assert (a["n_ngrams"] == other["n_ngrams"]).all()


def test_min_hits_threshold(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TRAIN)), pa.int64()),
        "text": pa.array(TRAIN, pa.string())}))
    out = ngram_contamination(ds, list(BENCH), n=4, min_hits=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    bench_set = set().union(*(_shingles(t, 4) for t in BENCH))
    for i, text in enumerate(TRAIN):
        n_hit = len(_shingles(text, 4) & bench_set)
        assert bool(out.iloc[i]["contaminated"]) == (n_hit >= 3)
