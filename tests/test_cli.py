"""CLI surface end-to-end: build → search → stats → modify → merge →
clear through `python -m icat_lucene_ray` argv handling (in-process;
ray.shutdown is stubbed so the session fixture survives)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "fast join over the data table",
    "window merge scan with data",
    "vector index build and probe",
    "fast join fast join again",
]


@pytest.fixture(scope="module")
def cli_env(ray_session, tmp_path_factory):
    import ray

    import icat_lucene_ray.__main__ as cli

    tmp = tmp_path_factory.mktemp("cli")
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
    }), src)
    orig_shutdown = ray.shutdown
    ray.shutdown = lambda *a, **k: None
    yield cli, src, tmp
    ray.shutdown = orig_shutdown


def _json_out(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_build_search_stats(cli_env, capsys):
    cli, src, tmp = cli_env
    idx = str(tmp / "idx")
    cli.main(["build", "--input", src, "--out", idx,
              "--id-col", "doc_id", "--meta", "lang",
              "--analyzer", "simple", "--segments", "2"])
    built = _json_out(capsys)
    assert built["num_docs"] == 4

    cli.main(["search", "--index", idx, "--query", '"fast join"',
              "--k", "5"])
    hits = _json_out(capsys)
    assert hits["total_hits"] >= 2
    assert {h["doc_id"] for h in hits["hits"]} >= {0, 3}

    cli.main(["stats", "--index", idx])
    st = _json_out(capsys)
    assert st["num_docs"] == 4 and st["generation"] == 0
    assert st["meta_cols"] == ["lang"] and st["deltas"] == []


def test_cli_facet(cli_env, capsys):
    cli, src, tmp = cli_env
    idx = str(tmp / "idx_facet")
    cli.main(["build", "--input", src, "--out", idx,
              "--id-col", "doc_id", "--meta", "lang",
              "--analyzer", "simple", "--segments", "2"])
    _json_out(capsys)
    # default dims = all string meta columns; '' = match-all
    cli.main(["facet", "--index", idx, "--query", ""])
    assert _json_out(capsys) == {"lang": {"en": 4}}
    cli.main(["facet", "--index", idx, "--query", '"fast join"',
              "--dims", "lang",
              "--ranges", '{"doc_id": [["lo", 0, 2], ["hi", 2, 9]]}'])
    out = _json_out(capsys)
    assert out["lang"] == {"en": 2}
    assert out["doc_id"]["lo"]["doc_count"] == 1
    assert out["doc_id"]["hi"]["doc_count"] == 1


def test_cli_modify_stats_merge_clear(cli_env, capsys, tmp_path):
    cli, src, tmp = cli_env
    idx = str(tmp / "idx2")
    cli.main(["build", "--input", src, "--out", idx,
              "--id-col", "doc_id", "--analyzer", "simple",
              "--segments", "2"])
    capsys.readouterr()

    ops = str(tmp_path / "ops.json")
    with open(ops, "w") as f:
        json.dump([{"create": {"doc_id": 99, "text": "brand new data"}},
                   {"delete": 1}], f)
    cli.main(["modify", "--index", idx, "--ops", ops])
    mod = _json_out(capsys)
    assert mod["generation"] == 1 and mod["num_docs"] == 4

    cli.main(["stats", "--index", idx])
    st = _json_out(capsys)
    assert st["deltas"] == [{"gen": 1, "n_created": 1, "n_deleted": 1}]

    merged = str(tmp_path / "merged")
    cli.main(["merge", "--index", idx, "--out", merged])
    mg = _json_out(capsys)
    assert mg["num_docs"] == 4

    cli.main(["search", "--index", merged, "--query", "brand", "--k", "5"])
    hits = _json_out(capsys)
    assert [h["doc_id"] for h in hits["hits"]] == [99]

    cli.main(["clear", "--index", idx])
    cl = _json_out(capsys)
    assert cl["num_docs"] == 0
    cli.main(["search", "--index", idx, "--query", "data", "--k", "5"])
    assert _json_out(capsys)["total_hits"] == 0


def test_cli_query_error_exits_cleanly(cli_env, capsys):
    """User-input errors (bad query syntax) exit 2 with a one-line JSON
    error — the reference returns HTTP 400, not a stack trace."""
    cli, src, tmp = cli_env
    idx = str(tmp / "idx_err")
    cli.main(["build", "--input", src, "--out", idx,
              "--id-col", "doc_id", "--segments", "2"])
    capsys.readouterr()
    with pytest.raises(SystemExit) as ei:
        cli.main(["search", "--index", idx, "--query", "spark~3",
                  "--k", "3"])
    assert ei.value.code == 2
    err = capsys.readouterr().err.strip().splitlines()[-1]
    msg = json.loads(err)
    assert msg["error"] == "QueryParseError" and "maxEdits" in msg["message"]
