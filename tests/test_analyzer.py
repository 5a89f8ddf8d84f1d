"""Analyzer golden fixtures — mirrors TestLucene.java:90-200 and
FIXTURES.md §2 exactly."""

from icat_lucene_ray.analysis import (
    IcatAnalyzer,
    IcatSynonymAnalyzer,
    PathHierarchyAnalyzer,
    SeparatorAnalyzer,
    SimpleAnalyzer,
    get_analyzer,
    porter_stem,
)


def test_icat_analyzer_golden():
    # cf. TestLucene.java:110-111 — exact 12-token stream
    a = IcatAnalyzer()
    text = ("This is a demo   of the 1st (or is it number 2) all singing "
            "and dancing TokenStream's API with added aardvarks")
    assert a.tokens(text) == [
        "demo", "of", "1st", "number", "2", "all", "sing", "danc",
        "tokenstream", "api", "ad", "aardvark",
    ]


def test_stop_words_keep_chemical_symbols():
    # cf. TestLucene.java:198-199 — As At Be In No survive stopwording
    a = IcatAnalyzer()
    assert a.tokens("as at be in no that the their then there") == [
        "as", "at", "be", "in", "no",
    ]


def test_possessive_filter():
    a = IcatAnalyzer()
    assert a.tokens("TokenStream's API") == ["tokenstream", "api"]
    assert a.tokens("the cats' whiskers") == ["cat", "whisker"]  # plural+stop


def test_porter_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "relational": "relat",
        "dancing": "danc", "singing": "sing", "added": "ad",
        "aardvarks": "aardvark", "number": "number", "hopping": "hop",
        "generalizations": "gener", "electrical": "electr",
    }
    for w, s in vectors.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_synonym_analyzer_elements():
    # cf. TestLucene.java:119-141 — element names/symbols co-expand,
    # applied post-stemming with expand=true
    a = IcatSynonymAnalyzer()
    assert a.tokens("Helium") == ["helium", "he"]
    assert a.tokens("He") == ["he", "helium"]
    # alternate spelling rule survives stemming (ionise/ionize -> ionis/ioniz)
    toks = a.tokens("ionised sample")
    assert "ionis" in toks and "ioniz" in toks and "sampl" in toks


def test_synonym_analyzer_stopword_interaction():
    # "In" is both a stop-survivor and the symbol for Indium
    a = IcatSynonymAnalyzer()
    assert a.tokens("In") == ["in", "indium"]


def test_simple_analyzer():
    a = SimpleAnalyzer()
    assert a.tokens("The Fast  FOX") == ["the", "fast", "fox"]


def test_separator_analyzer():
    # IcatSeparatorAnalyzer.java:13-26 — split on one char + lowercase
    a = SeparatorAnalyzer("/")
    assert a.tokens("/Dir/SubDir/File.txt") == ["dir", "subdir", "file.txt"]
    b = SeparatorAnalyzer(".")
    assert b.tokens("File.TXT") == ["file", "txt"]


def test_path_hierarchy_analyzer():
    # Lucene.java:440-445 — case-sensitive prefix tokens
    a = PathHierarchyAnalyzer()
    assert a.tokens("/Dir/SubDir/file.txt") == [
        "/Dir", "/Dir/SubDir", "/Dir/SubDir/file.txt",
    ]


def test_registry():
    assert get_analyzer("icat").name == "icat"
    assert get_analyzer("simple").name == "simple"
    try:
        get_analyzer("nope")
        assert False
    except ValueError:
        pass


def test_memo_determinism():
    a = IcatAnalyzer()
    t = "Dancing dancers danced dances"
    assert a.tokens(t) == a.tokens(t) == ["danc", "dancer", "danc", "danc"]


def test_multitoken_synonym_rules():
    """SynonymGraphFilter multi-word entries (IcatSynonymAnalyzer.java:
    48-56): 'solid state, ssd' — matching the phrase adds 'ssd'; the
    single token adds the phrase's stems (bag insertion, originals
    stay)."""
    from collections import Counter

    from icat_lucene_ray.analysis.analyzer import IcatSynonymAnalyzer

    an = IcatSynonymAnalyzer(["solid state, ssd", "lead, pb"])
    c = Counter(an.tokens("a solid state drive"))
    # phrase matched: originals stay, 'ssd' added
    assert c["ssd"] == 1 and c["solid"] == 1 and c["state"] == 1
    c2 = Counter(an.tokens("the ssd was fast"))
    assert c2["ssd"] == 1 and c2["solid"] == 1 and c2["state"] == 1
    # single-token class still works alongside
    assert set(an.tokens("lead")) == {"lead", "pb"}
    # no match across different texts / non-adjacent stems
    c3 = Counter(an.tokens("solid rock state"))
    assert "ssd" not in c3


def test_multitoken_synonyms_vectorized_matches_scalar():
    import pyarrow as pa

    from icat_lucene_ray.analysis.analyzer import IcatSynonymAnalyzer
    from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer

    an = IcatSynonymAnalyzer(["solid state, ssd", "new york => nyc"])
    van = VectorizedAnalyzer(an)
    texts = [
        "a solid state drive in new york",
        "solid state solid state",   # two matches
        "ssd only", "new york new york city", "", "state solid",
    ]
    offs, terms, tfs, dls = van.term_freq_batch(pa.array(texts))
    for i, t in enumerate(texts):
        got = dict(zip(terms.to_pylist()[offs[i]:offs[i + 1]],
                       tfs[offs[i]:offs[i + 1]].tolist()))
        want = dict(an.term_freqs(t))
        assert got == want, (i, got, want)
        assert int(dls[i]) == sum(want.values())
