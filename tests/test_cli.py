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


def test_cli_build_from_jsonl_and_csv(cli_env, capsys):
    """`build --format jsonl|csv`: raw corpora are converted to
    resumable parquet shards (sources.ingest.ingest_to_parquet), and
    the resulting index answers queries identically to a parquet
    build of the same rows."""
    cli, src, tmp = cli_env
    jl = str(tmp / "docs.jsonl")
    with open(jl, "w") as f:
        for i, t in enumerate(TEXTS):
            f.write(json.dumps({"doc_id": i, "text": t, "lang": "en"})
                    + "\n")
    cs = str(tmp / "docs.csv")
    with open(cs, "w") as f:
        f.write("doc_id,text,lang\n")
        for i, t in enumerate(TEXTS):
            f.write(f'{i},"{t}",en\n')

    hits = {}
    for fmt, path in (("parquet", src), ("jsonl", jl), ("csv", cs)):
        idx = str(tmp / f"idx_{fmt}")
        argv = ["build", "--input", path, "--out", idx,
                "--id-col", "doc_id", "--meta", "lang",
                "--analyzer", "simple", "--segments", "2"]
        if fmt != "parquet":
            argv += ["--format", fmt]
        cli.main(argv)
        assert _json_out(capsys)["num_docs"] == len(TEXTS)
        cli.main(["search", "--index", idx, "--query", "fast join",
                  "--k", "4"])
        hits[fmt] = _json_out(capsys)["hits"]
    assert hits["jsonl"] == hits["parquet"]
    assert hits["csv"] == hits["parquet"]


def test_ingest_to_parquet_resume(cli_env):
    """A second ingest call with unchanged inputs is a no-op (lineage
    marker hit); changing an input file re-converts its shard."""
    import os

    import pyarrow.parquet as pq2

    from icat_lucene_ray.sources.ingest import ingest_to_parquet

    cli, src, tmp = cli_env
    raw = tmp / "resume_raw"
    raw.mkdir()
    for si in range(2):
        with open(raw / f"part{si}.jsonl", "w") as f:
            for i, t in enumerate(TEXTS[si * 2:si * 2 + 2]):
                f.write(json.dumps({"doc_id": si * 2 + i, "text": t})
                        + "\n")
    out = str(tmp / "resume_out")
    files = ingest_to_parquet(str(raw), out, fmt="jsonl", shards=2)
    dirs = sorted({os.path.dirname(f) for f in files})
    assert len(dirs) == 2
    mtimes = {d: os.path.getmtime(os.path.join(d, "_DONE.json"))
              for d in dirs}
    assert ingest_to_parquet(str(raw), out, fmt="jsonl", shards=2) == files
    for d in dirs:  # markers untouched -> shards were skipped
        assert os.path.getmtime(os.path.join(d, "_DONE.json")) == mtimes[d]
    # grow one input file: only that shard re-converts
    with open(raw / "part1.jsonl", "a") as f:
        f.write(json.dumps({"doc_id": 99, "text": "extra appended row"})
                + "\n")
    files2 = ingest_to_parquet(str(raw), out, fmt="jsonl", shards=2)
    n_rows = sum(pq2.read_table(f).num_rows for f in files2
                 if f.startswith(dirs[1]))
    assert n_rows == 3
    assert os.path.getmtime(os.path.join(dirs[0], "_DONE.json")) \
        == mtimes[dirs[0]]


def _wet_bytes(records, warcinfo=True):
    """Synthesize a WET file: optional warcinfo record then conversion
    records (url, iso_date, text)."""
    out = []
    if warcinfo:
        body = b"software: test\r\n"
        out.append(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                   b"Content-Length: %d\r\n\r\n%s\r\n\r\n"
                   % (len(body), body))
    for url, date, text in records:
        body = text.encode("utf-8")
        out.append(
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: %s\r\nWARC-Date: %s\r\n"
            b"Content-Length: %d\r\n\r\n%s\r\n\r\n"
            % (url.encode(), date.encode(), len(body), body))
    return b"".join(out)


def test_parse_wet_bytes_roundtrip():
    """WET parser: skips warcinfo, keeps conversion records, jumps by
    Content-Length (a body containing 'WARC/1.0' cannot desync it),
    parses ISO dates to timestamp[us], handles gzip."""
    import gzip

    from icat_lucene_ray.sources.ingest import parse_wet_bytes

    recs = [
        ("http://a.example/x", "2013-12-04T16:47:32Z",
         "plain text body one"),
        ("http://b.example/y", "2020-01-01T00:00:00Z",
         "tricky body with\r\nWARC/1.0 inside it"),
        ("http://c.example/z", "2021-06-15T12:30:45Z",
         "unicode éè body"),
    ]
    t = parse_wet_bytes(_wet_bytes(recs))
    assert t.column("url").to_pylist() == [r[0] for r in recs]
    assert t.column("text").to_pylist() == [r[2] for r in recs]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert t.column("warc_ts").to_pylist()[0].year == 2013
    tz = parse_wet_bytes(gzip.compress(_wet_bytes(recs)))
    assert tz.equals(t)
    assert parse_wet_bytes(b"").num_rows == 0


def test_cli_build_from_wet(cli_env, capsys):
    """`build --format wet`: a synthetic Common-Crawl-style WET file
    indexes end-to-end; doc keys derive from the record URLs."""
    cli, src, tmp = cli_env
    recs = [(f"http://ex.org/{i}", "2024-03-01T00:00:0%dZ" % i, t)
            for i, t in enumerate(TEXTS)]
    wet = str(tmp / "crawl.warc.wet.gz")
    import gzip

    with open(wet, "wb") as f:
        f.write(gzip.compress(_wet_bytes(recs)))
    idx = str(tmp / "idx_wet")
    cli.main(["build", "--input", wet, "--format", "wet", "--out", idx,
              "--key-col", "url", "--meta", "url",
              "--analyzer", "simple", "--segments", "2"])
    assert _json_out(capsys)["num_docs"] == len(TEXTS)
    cli.main(["search", "--index", idx, "--query", "fast join",
              "--k", "4", "--fields", "url"])
    hits = _json_out(capsys)["hits"]
    assert {h["url"] for h in hits} == {"http://ex.org/0",
                                        "http://ex.org/3"}
