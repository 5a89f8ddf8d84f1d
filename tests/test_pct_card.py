"""Percentiles and cardinality aggregations over query matches (ES
``percentiles`` / ``cardinality`` surfaces composed from
``matches_dataset`` + the stats ops) — exact quantile_disc parity vs a
brute-force rank oracle, HLL-vs-exact agreement, delete visibility,
and the CLI verbs."""

import math

import numpy as np
import pytest

from icat_lucene_ray.query import MatchAll, Or, Term


def _terms_by_df(oracle):
    dfs = sorted(((len(p), t) for t, p in oracle.postings.items()),
                 reverse=True)
    head = dfs[0][1]
    mid = [t for df, t in dfs if 20 < df < 80][:4]
    return head, mid


def _match_ts(oracle, q) -> np.ndarray:
    m, _ = oracle._eval(q)
    return np.array(
        [v for d, v in zip(oracle.doc_ids, oracle.meta["warc_ts"])
         if int(d) in m and v is not None],
        dtype="datetime64[us]").astype(np.int64).astype(np.float64)


# ---------------- percentiles ------------------------------------------

def test_percentiles_match_quantile_disc(engine, oracle):
    head, mid = _terms_by_df(oracle)
    qs = [0.25, 0.5, 0.75, 0.95]
    for q in (Term(head), Or([Term(mid[0]), Term(mid[1])]), MatchAll()):
        # cap=10 forces the multi-pass narrowing loop, not the
        # small-n exact fetch
        got = engine.percentiles(q, "warc_ts", qs, cap=10)
        vals = np.sort(_match_ts(oracle, q))
        n = len(vals)
        for qq in qs:
            want = float(vals[max(0, math.ceil(qq * n) - 1)])
            assert got[qq] == want, (qq, got[qq], want)


def test_percentiles_empty_match(engine):
    got = engine.percentiles(Term("zz-no-such-term-zz"), "warc_ts",
                             [0.5])
    assert math.isnan(got[0.5])


def test_percentiles_unstored_field_raises(engine):
    with pytest.raises(ValueError):
        engine.percentiles(MatchAll(), "no_such_col")


# ---------------- cardinality ------------------------------------------

def test_cardinality_exact_and_hll(engine, oracle):
    head, mid = _terms_by_df(oracle)
    for q in (Term(head), Or([Term(mid[0]), Term(mid[1])]), MatchAll()):
        m, _ = oracle._eval(q)
        want = len({v for d, v in zip(oracle.doc_ids,
                                      oracle.meta["lang"])
                    if int(d) in m and v is not None})
        assert engine.cardinality(q, "lang", exact=True) == want
        est = engine.cardinality(q, "lang")
        # p=14 linear counting is exact at this cardinality scale
        assert abs(est - want) <= max(1.0, 0.02 * want)


def test_cardinality_empty_match(engine):
    assert engine.cardinality(Term("zz-no-such-term-zz"), "lang",
                              exact=True) == 0
    assert engine.cardinality(Term("zz-no-such-term-zz"), "lang") == 0.0


def test_cardinality_sees_deletes(ray_session, tmp_path):
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.corpus import write_pages
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.index.modify import IndexUpdater
    from icat_lucene_ray.query import Index

    pages = str(tmp_path / "pages")
    write_pages(pages, 60, rows_per_file=30, vocab_size=400)
    out = str(tmp_path / "idx")
    build_index(pages, out, meta_cols=["lang", "warc_ts"],
                config=EngineConfig(num_segments=2))
    idx = Index(out)
    # delete every doc of one lang; its key must leave the distinct set
    t = idx._doc_store_table(columns=["lang"])
    langs = t["lang"].to_pylist()
    victim = langs[0]
    ids = [int(d) for d, v in zip(t["doc_id"].to_pylist(), langs)
           if v == victim]
    before = idx.cardinality(MatchAll(), "lang", exact=True)
    up = IndexUpdater(out)
    for i in ids:
        up.delete(i)
    up.commit()
    after = Index(out).cardinality(MatchAll(), "lang", exact=True)
    assert after == before - 1


# ---------------- significant terms ------------------------------------

def test_significant_terms_matches_brute_force(engine, oracle):
    head, mid = _terms_by_df(oracle)
    for q in (Term(head), Or([Term(mid[0]), Term(mid[1])])):
        t = engine.significant_terms(q, "lang", k=5)
        m, _ = oracle._eval(q)
        fg: dict = {}
        bg: dict = {}
        for d, v in zip(oracle.doc_ids, oracle.meta["lang"]):
            if v is None:
                continue
            bg[v] = bg.get(v, 0) + 1
            if int(d) in m:
                fg[v] = fg.get(v, 0) + 1
        ft, bt = float(sum(fg.values())), float(sum(bg.values()))
        rows = []
        for term, c in fg.items():
            fp, bp = c / ft, bg[term] / bt
            rows.append((term, c, bg[term],
                         round((fp - bp) * (fp / bp), 6)))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want = rows[:5]
        got = list(zip(t["term"].to_pylist(),
                       t["fg_count"].to_pylist(),
                       t["bg_count"].to_pylist(),
                       t["score"].to_pylist()))
        assert got == want


def test_significant_terms_empty_match(engine):
    t = engine.significant_terms(Term("zz-no-such-term-zz"), "lang")
    assert t.num_rows == 0


def test_significant_terms_min_doc_count(engine, oracle):
    head, _ = _terms_by_df(oracle)
    t_all = engine.significant_terms(Term(head), "lang", k=100)
    lo = int(min(t_all["fg_count"].to_pylist()))
    t = engine.significant_terms(Term(head), "lang", k=100,
                                 min_doc_count=lo + 1)
    assert all(c > lo for c in t["fg_count"].to_pylist())


# ---------------- CLI verbs --------------------------------------------

def test_cli_pct_card(cli_index, capsys):
    import json

    cli, idx = cli_index
    cli.main(["pct", "--index", idx, "--query", "data",
              "--field", "doc_id", "--qs", "0.5,0.95"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"0.5", "0.95"}
    cli.main(["card", "--index", idx, "--query", "data",
              "--field", "lang", "--exact"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["exact"] is True and out["cardinality"] >= 1
    cli.main(["sig", "--index", idx, "--query", "scan",
              "--field", "lang", "--k", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 'scan' matches only the 3 'data table scan' docs: en/de overrep
    assert {r["term"] for r in out["terms"]} == {"en", "de"}


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    import icat_lucene_ray.__main__ as cli

    tmp = tmp_path_factory.mktemp("cli_pct")
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["data table scan"] * 3
                         + ["data window merge"] * 3, pa.string()),
        "lang": pa.array(["en", "de", "en", "fr", "en", "de"],
                         pa.string()),
    }), src)
    idx = str(tmp / "idx")
    orig_shutdown = ray.shutdown
    ray.shutdown = lambda *a, **k: None
    try:
        cli.main(["build", "--input", src, "--out", idx,
                  "--id-col", "doc_id", "--meta", "lang",
                  "--analyzer", "simple", "--segments", "2"])
        yield cli, idx
    finally:
        ray.shutdown = orig_shutdown
