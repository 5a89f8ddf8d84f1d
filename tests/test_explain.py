"""Index.explain (IndexSearcher.explain analog): node values come
from the real evaluation path, Term leaves decompose into BM25
factors whose product reproduces the search score, and boolean
combinators report their children."""

import pytest

from icat_lucene_ray.query import (
    DisMax, Filter, Not, Or, Term, Weight,
)


def _terms_by_df(oracle):
    dfs = sorted(((len(p), t) for t, p in oracle.postings.items()),
                 reverse=True)
    head = dfs[0][1]
    mid = [t for df, t in dfs if 20 < df < 80][:4]
    return head, mid


def _top_hit(engine, q):
    r = engine.search(q, k=1)
    return (int(r.table["doc_id"][0].as_py()),
            float(r.table["score"][0].as_py()))


def test_explain_term_value_and_bm25_decomposition(engine, oracle):
    head, _ = _terms_by_df(oracle)
    d, score = _top_hit(engine, Term(head))
    e = engine.explain(Term(head), d)
    assert e["matched"] and e["scoring"]
    assert abs(e["value"] - round(score, 6)) <= 1e-6
    # leaf decomposition: sum of per-stem idf*tfnorm == node value
    assert e["details"], "term vector decomposition expected"
    total = sum(leaf["value"] for leaf in e["details"])
    assert abs(total - score) <= 1e-6 * max(1.0, score)
    idf = e["details"][0]["details"][0]["value"]
    tfn = e["details"][0]["details"][1]["value"]
    assert abs(idf * tfn - e["details"][0]["value"]) <= 1e-9


def test_explain_non_match(engine):
    e = engine.explain(Term("zz-no-such-term-zz"), 0)
    assert e["matched"] is False and e["value"] == 0.0
    assert e["details"] == []


def test_explain_or_sums_children(engine, oracle):
    head, mid = _terms_by_df(oracle)
    q = Or([Term(head), Term(mid[0])])
    d, score = _top_hit(engine, q)
    e = engine.explain(q, d)
    assert len(e["details"]) == 2
    got = sum(c["value"] for c in e["details"] if c["matched"])
    assert abs(got - e["value"]) <= 1e-5 * max(1.0, e["value"])


def test_explain_weight_multiplies(engine, oracle):
    head, _ = _terms_by_df(oracle)
    d, _ = _top_hit(engine, Term(head))
    base = engine.explain(Term(head), d)["value"]
    e = engine.explain(Weight(Term(head), 2.5), d)
    assert abs(e["value"] - 2.5 * base) <= 1e-5 * max(1.0, e["value"])
    assert e["details"][0]["description"].startswith("term")


def test_explain_dismax_and_not_and_filter(engine, oracle):
    head, mid = _terms_by_df(oracle)
    q = DisMax([Term(head), Term(mid[0])], tie=0.3)
    d, score = _top_hit(engine, q)
    e = engine.explain(q, d)
    assert abs(e["value"] - round(score, 6)) <= 1e-6
    vals = [c["value"] for c in e["details"] if c["matched"]]
    want = max(vals) + 0.3 * (sum(vals) - max(vals))
    assert abs(e["value"] - want) <= 1e-5 * max(1.0, want)

    nq = Not(Term(head), Term(mid[0]))
    dn, _ = _top_hit(engine, nq)
    en = engine.explain(nq, dn)
    assert en["matched"]
    assert en["details"][1]["description"].startswith("MUST_NOT")
    assert en["details"][1]["matched"] is False

    f = Filter("lang", "en")
    ef = engine.explain(f, dn)
    assert ef["scoring"] is False
    assert "non-scoring" in ef["description"]


def test_explain_cli(cli_index, capsys):
    import json

    cli, idx = cli_index
    cli.main(["explain", "--index", idx, "--query", "data", "--doc",
              "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["matched"] is True and out["value"] > 0
    assert out["details"][0]["details"][0]["description"].startswith(
        "idf")


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    import icat_lucene_ray.__main__ as cli

    tmp = tmp_path_factory.mktemp("cli_explain")
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["data table scan", "window merge",
                          "data data join", "vector probe"],
                         pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
    }), src)
    idx = str(tmp / "idx")
    orig_shutdown = ray.shutdown
    ray.shutdown = lambda *a, **k: None
    try:
        cli.main(["build", "--input", src, "--out", idx,
                  "--id-col", "doc_id", "--meta", "lang",
                  "--analyzer", "simple", "--segments", "1"])
        yield cli, idx
    finally:
        ray.shutdown = orig_shutdown
