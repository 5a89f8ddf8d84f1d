"""Property test: the vectorized batch tokenizer is exactly equivalent
to the scalar analyzer chain."""

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.analysis import IcatAnalyzer, SimpleAnalyzer, get_analyzer
from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer


def _check_equivalence(analyzer, texts):
    v = VectorizedAnalyzer(analyzer)
    offsets, terms, tfs, doc_lens = v.term_freq_batch(pa.array(texts))
    terms = terms.to_pylist()
    for i, text in enumerate(texts):
        got = dict(zip(terms[offsets[i]:offsets[i + 1]],
                       tfs[offsets[i]:offsets[i + 1]].tolist()))
        expected = dict(analyzer.term_freqs(text))
        assert got == expected, (text, got, expected)
        assert doc_lens[i] == sum(expected.values())


CASES = [
    "This is a demo   of the 1st (or is it number 2) all singing "
    "and dancing TokenStream's API with added aardvarks",
    "as at be in no that the their then there",
    "",
    "   ",
    "café ümlaut naïve — 3.14 1,000 'quoted' trailing.",
    "x",
    "the the the the",
    "punct!!!; mixed_case CamelCase foo_bar don't cats' O'Brien's",
]


def test_golden_cases_icat():
    _check_equivalence(IcatAnalyzer(), CASES)


def test_golden_cases_simple():
    _check_equivalence(SimpleAnalyzer(), CASES)


def test_golden_cases_synonym():
    _check_equivalence(get_analyzer("icat_synonym"),
                       ["Helium and Nickel ionised", "He Ni In"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_corpus_equivalence(seed):
    from icat_lucene_ray.corpus import generate_pages

    t = generate_pages(60, seed=seed, vocab_size=500)
    _check_equivalence(IcatAnalyzer(), t["text"].to_pylist())


def test_random_noise_equivalence():
    rng = np.random.default_rng(9)
    chars = list("abc DEF'’.,!-_09 \t\n(x)é")
    texts = ["".join(rng.choice(chars, size=rng.integers(0, 200)))
             for _ in range(80)]
    _check_equivalence(IcatAnalyzer(), texts)


def test_memo_reuse_across_batches():
    an = IcatAnalyzer()
    v = VectorizedAnalyzer(an)
    t1 = ["dancing cats", "singing dogs"]
    t2 = ["dancing dogs"]
    v.term_freq_batch(pa.array(t1))
    assert "dancing" in v._memo
    _check_equivalence(an, t2)  # fresh check
    offsets, terms, tfs, _ = v.term_freq_batch(pa.array(t2))
    assert set(terms.to_pylist()) == {"danc", "dog"}
