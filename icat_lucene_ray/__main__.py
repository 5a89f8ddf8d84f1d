"""CLI entry point — the ``ray job submit`` surface.

Examples::

    # index build (resumable; rerun with --resume to skip done shards)
    ray job submit -- python -m icat_lucene_ray build \
        --input /data/pages --out /data/index \
        --meta lang,warc_ts --shards 64 --segments 64 --resume

    # query
    python -m icat_lucene_ray search --index /data/index \
        --query "aardvark dancing" --k 10

Owns its Ray session (guarded init) — unlike the library code, which
never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _init_ray(num_cpus: int | None):
    import os as _os

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR")
        # under `ray job submit` RAY_ADDRESS points at the cluster —
        # hard-coding "local" would silently ignore it (and per-session
        # num_cpus is a local-mode-only knob)
        addr = _os.environ.get("RAY_ADDRESS", "local")
        if num_cpus and addr == "local":
            kw["num_cpus"] = num_cpus
        ray.init(address=addr, **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args):
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    _init_ray(args.num_cpus)
    cfg = EngineConfig(analyzer=args.analyzer, num_segments=args.segments)
    tcols = [c for c in args.text_col.split(",") if c]
    inp = args.input
    if args.format != "parquet":
        from icat_lucene_ray.sources.ingest import ingest_to_parquet

        # raw corpus (jsonl/csv): one streaming conversion pass into
        # resumable parquet shards under the index dir, then build
        inp = ingest_to_parquet(
            inp, os.path.join(args.out, "_ingest"), fmt=args.format,
            shards=max(1, args.shards))
    m = build_index(
        inp, args.out,
        text_col=tcols[0],
        text_cols=tcols if len(tcols) > 1 else None,
        id_col=args.id_col,
        key_col=args.key_col,
        meta_cols=args.meta.split(",") if args.meta else [],
        config=cfg,
        checkpoint_shards=args.shards,
        resume=args.resume,
    )
    print(json.dumps({"num_docs": m.num_docs, "avgdl": round(m.avgdl, 2),
                      "segments": len(m.segments),
                      "hot_terms": len(m.hot_terms), "metrics": m.metrics}))


def cmd_search(args):
    """Free-text query string → parsed AST (Q2): bare terms OR across
    the index's text fields, plus field:term / "phrases" / wildcards /
    AND / OR / NOT / +must / -not (SearchBucket.java:217-298)."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    r = idx.search(q, k=args.k,
                   fields=args.fields.split(",") if args.fields else None,
                   collapse=args.collapse or None)
    print(json.dumps({
        "total_hits": r.total_hits,
        "hits": r.table.to_pylist(),
        "search_after": r.search_after,
    }, default=str))


def cmd_highlight(args):
    """Search + one highlighted fragment per hit (``Index.highlight``):
    token-window snippet anchored on the first scoring term, every
    matching token wrapped. ``--source`` names the original parquet
    table when the doc store keeps only the analyzed form."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    t = idx.highlight(q, k=args.k, window=args.window,
                      pre=args.pre, post=args.post,
                      source=args.source or None,
                      source_id_col=args.source_id_col)
    print(json.dumps({"hits": t.to_pylist()}, default=str))


def cmd_suggest(args):
    """Spell suggestions from the term dictionary (``Index.suggest``):
    distance asc, doc frequency desc, term asc."""
    from icat_lucene_ray.query import Index

    _init_ray(args.num_cpus)
    idx = Index(args.index)
    t = idx.suggest(args.term, k=args.k, max_edits=args.max_edits,
                    field=args.field or None)
    print(json.dumps({"suggestions": t.to_pylist()}, default=str))


def cmd_mlt(args):
    """More-like-this verb (``Index.more_like_this``): the document's
    top tf×idf terms become a BM25 disjunction, the source doc is
    dropped from the hits."""
    from icat_lucene_ray.query import Index

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    kw = dict(max_query_terms=args.max_query_terms,
              min_term_freq=args.min_term_freq,
              min_doc_freq=args.min_doc_freq,
              source=args.source or None,
              source_id_col=args.source_id_col)
    terms = idx.mlt_terms(args.doc_id, **kw)
    r = idx.more_like_this(args.doc_id, k=args.k, **kw)
    print(json.dumps({"terms": terms, "hits": r.table.to_pylist()},
                     default=str))


def cmd_export(args):
    """Export verb (``Index.matches_dataset``): ALL matching docs stream
    to partitioned parquet — one scan task per doc-store file, pure
    predicates pushed into the scan, index match-ids broadcast once."""
    import pyarrow.parquet as pq
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    cols = [c for c in (args.columns or "").split(",") if c] or None
    ds = idx.matches_dataset(q, columns=cols, with_score=args.with_score)
    os.makedirs(args.out, exist_ok=True)
    ds.write_parquet(args.out)
    files = [os.path.join(r, f) for r, _d, fs in os.walk(args.out)
             for f in fs if f.endswith(".parquet")]
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    print(json.dumps({"rows": rows, "files": len(files),
                      "out": args.out}))


def cmd_agg(args):
    """Metrics aggregation verb (ES ``stats`` aggregation analog):
    count/sum/min/max/mean of a numeric doc-store column over the
    docs matching the query — per-fragment partials, no value scan
    on the driver."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    print(json.dumps(idx.aggregate_stats(q, args.field), default=str))


def cmd_hist(args):
    """Histogram aggregation verb (ES histogram / date_histogram
    analog): fixed-interval bucket counts of a numeric doc-store
    column over the docs matching the query."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    t = idx.histogram(q, args.field, args.interval, offset=args.offset)
    print(json.dumps({"buckets": t.to_pylist()}, default=str))


def cmd_pct(args):
    """Percentiles aggregation verb (ES ``percentiles`` analog, exact
    ``quantile_disc`` values): matching docs stream through the
    multi-pass histogram-narrowing selection — never a driver value
    scan."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    qs = [float(x) for x in args.qs.split(",") if x]
    got = idx.percentiles(q, args.field, qs)
    # empty match -> NaN; emit strict-JSON null instead
    print(json.dumps({str(k): (None if got[k] != got[k] else got[k])
                      for k in qs}, default=str))


def cmd_card(args):
    """Cardinality aggregation verb (ES ``cardinality`` analog):
    approximate distinct count of a doc-store column over the matching
    docs via a one-pass HLL sketch; --exact runs the exact distinct
    groupby instead."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    v = idx.cardinality(q, args.field, exact=args.exact)
    print(json.dumps({"field": args.field, "cardinality": v,
                      "exact": bool(args.exact)}))


def cmd_explain(args):
    """Explain verb (Lucene IndexSearcher.explain analog): the BM25
    score breakdown of one document under a query, as a nested
    Explanation JSON tree."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    print(json.dumps(idx.explain(q, args.doc), default=str))


def cmd_sig(args):
    """Significant-terms verb (ES ``significant_terms`` analog, JLH
    heuristic): terms of a string doc-store column over-represented in
    the matching docs vs the whole corpus."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    t = idx.significant_terms(q, args.field, k=args.k,
                              min_doc_count=args.min_doc_count)
    print(json.dumps({"terms": t.to_pylist()}, default=str))


def cmd_facet(args):
    """Facet verb — the reference's dedicated facet surface
    (``POST /{entity}/facet``, Lucene.java:956-973) as its own CLI
    verb: parse the query string, count string dims (or all string
    meta columns when none given) and optional numeric ranges."""
    from icat_lucene_ray.query import Index, parse_query

    _init_ray(args.num_cpus)
    idx = Index(args.index, use_actors=args.actors)
    q = parse_query(args.query,
                    default_fields=(idx.text_fields or None))
    ranges = json.loads(args.ranges) if args.ranges else None
    if ranges:
        ranges = {f: [(str(lbl), float(lo), float(hi))
                      for lbl, lo, hi in rs] for f, rs in ranges.items()}
    dims = args.dims.split(",") if args.dims else None
    print(json.dumps(idx.facets(q, dims=dims, ranges=ranges,
                                max_labels=args.max_labels),
                     default=str))


def cmd_modify(args):
    """Apply a JSON op array (the reference's POST /modify payload,
    Lucene.java:481-513) and commit."""
    from icat_lucene_ray.index.modify import IndexUpdater
    from icat_lucene_ray.sources import read_modify_ops

    _init_ray(args.num_cpus)
    ops = read_modify_ops(sys.stdin if args.ops == "-" else args.ops)
    up = IndexUpdater(args.index)
    up.modify(ops)
    m = up.commit()
    print(json.dumps({"generation": m.generation, "num_docs": m.num_docs,
                      "avgdl": round(m.avgdl, 2)}))


def cmd_clear(args):
    """S6 clear verb (Lucene.java:547-566): drop every document, keep
    the index writable."""
    from icat_lucene_ray.index.modify import clear_index

    _init_ray(args.num_cpus)
    m = clear_index(args.index)
    print(json.dumps({"num_docs": m.num_docs, "generation": m.generation}))


def cmd_merge(args):
    from icat_lucene_ray.index.modify import force_merge

    _init_ray(args.num_cpus)
    m = force_merge(args.index, args.out)
    print(json.dumps({"num_docs": m.num_docs, "segments": len(m.segments),
                      "avgdl": round(m.avgdl, 2)}))


def cmd_synonyms(args):
    """Terminology CSV → Solr synonym rules (no Ray session needed) —
    the reference's parse_synonyms.py utility as a CLI verb."""
    from icat_lucene_ray.analysis.terminology import csv_to_solr_synonyms

    n = csv_to_solr_synonyms(args.input, args.out,
                             mode="w" if args.overwrite else "a",
                             max_child_depth=args.max_child_depth)
    print(json.dumps({"rules_written": n, "out": args.out}))


def cmd_stats(args):
    """S7/ST5-style introspection (the reference's getVersion + shard
    doc counts, Lucene.java:755-779 status surface): manifest-only
    read — no Ray session, no data scan."""
    from icat_lucene_ray.index.manifest import IndexManifest

    m = IndexManifest.load(args.index)
    print(json.dumps({
        "num_docs": m.num_docs, "avgdl": round(m.avgdl, 4),
        "total_tokens": m.total_tokens,
        "segments": len(m.segments), "generation": m.generation,
        "deltas": [{"gen": d["gen"], "n_created": d.get("n_created", 0),
                    "n_deleted": d.get("n_deleted", 0)}
                   for d in m.deltas],
        "text_fields": m.text_fields, "meta_cols": m.meta_cols,
        "analyzer": m.analyzer, "analyzer_version": m.analyzer_version,
        "format_version": m.format_version,
        "id_assignment": m.id_assignment,
        "hot_terms": len(m.hot_terms),
        "positions": bool(m.config.get("positions", False)),
    }))


def cmd_curate(args):
    from icat_lucene_ray.pipelines.curate import CurateConfig, curate

    _init_ray(args.num_cpus)
    cfg = CurateConfig(
        text_col=args.text_col,
        id_col=args.id_col,
        drop_cols=tuple(args.drop_cols.split(","))
        if args.drop_cols else (),
        langs=tuple(args.langs.split(",")) if args.langs else None,
        near_dup_threshold=(None if args.no_near_dup
                            else args.near_dup_threshold),
    )
    inp = args.input
    if args.format != "parquet":
        from icat_lucene_ray.sources.ingest import ingest_to_parquet

        inp = ingest_to_parquet(inp, os.path.join(args.out, "_ingest"),
                                fmt=args.format)
    report = curate(inp, args.out, bench=args.bench, cfg=cfg)
    print(json.dumps(report))


def main(argv=None):
    p = argparse.ArgumentParser(prog="icat_lucene_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "csv", "wet"],
                   help="input corpus format; jsonl/csv/wet (Common "
                        "Crawl WARC text extracts) are converted to "
                        "parquet shards under <out>/_ingest first "
                        "(streaming, resumable)")
    b.add_argument("--text-col", default="text",
                   help="single text column, or comma-separated columns "
                        "for a multi-field index (M2)")
    b.add_argument("--id-col", default=None)
    b.add_argument("--key-col", default="url")
    b.add_argument("--meta", default="")
    b.add_argument("--analyzer", default="icat")
    b.add_argument("--segments", type=int, default=16)
    b.add_argument("--shards", type=int, default=1)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="query an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--fields", default="")
    s.add_argument("--collapse", default="",
                   help="doc-store column: keep only the best hit per "
                        "distinct value (field collapsing)")
    s.add_argument("--actors", action="store_true")
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_search)

    hl = sub.add_parser("highlight",
                        help="query + highlighted snippet per hit")
    hl.add_argument("--index", required=True)
    hl.add_argument("--query", required=True)
    hl.add_argument("--k", type=int, default=10)
    hl.add_argument("--window", type=int, default=5)
    hl.add_argument("--pre", default="<em>")
    hl.add_argument("--post", default="</em>")
    hl.add_argument("--source", default="",
                    help="original parquet table for snippet text when "
                         "the doc store keeps only the analyzed form")
    hl.add_argument("--source-id-col", default="doc_id")
    hl.add_argument("--actors", action="store_true")
    hl.add_argument("--num-cpus", type=int, default=None)
    hl.set_defaults(fn=cmd_highlight)

    sg = sub.add_parser("suggest",
                        help="spell suggestions from the term dictionary")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("--k", type=int, default=5)
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("--field", default="")
    sg.add_argument("--num-cpus", type=int, default=None)
    sg.set_defaults(fn=cmd_suggest)

    ml = sub.add_parser("mlt", help="more-like-this: docs similar to "
                        "one document")
    ml.add_argument("--index", required=True)
    ml.add_argument("--doc-id", required=True, type=int)
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-query-terms", type=int, default=10)
    ml.add_argument("--min-term-freq", type=int, default=1)
    ml.add_argument("--min-doc-freq", type=int, default=1)
    ml.add_argument("--source", default="",
                    help="original parquet table when the doc store "
                         "keeps only the analyzed form")
    ml.add_argument("--source-id-col", default="doc_id")
    ml.add_argument("--actors", action="store_true")
    ml.add_argument("--num-cpus", type=int, default=None)
    ml.set_defaults(fn=cmd_mlt)

    ex = sub.add_parser("export", help="stream ALL matching docs to "
                        "partitioned parquet")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--columns", default="",
                    help="comma-separated stored columns (default: all)")
    ex.add_argument("--with-score", action="store_true")
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.set_defaults(fn=cmd_export)

    ag = sub.add_parser("agg", help="stats aggregation (count/sum/min/"
                                    "max/mean of a numeric column over "
                                    "matching docs)")
    ag.add_argument("--index", required=True)
    ag.add_argument("--query", required=True)
    ag.add_argument("--field", required=True)
    ag.add_argument("--actors", action="store_true")
    ag.add_argument("--num-cpus", type=int, default=None)
    ag.set_defaults(fn=cmd_agg)

    hg = sub.add_parser("hist", help="histogram aggregation (fixed-"
                                     "interval bucket counts over "
                                     "matching docs)")
    hg.add_argument("--index", required=True)
    hg.add_argument("--query", required=True)
    hg.add_argument("--field", required=True)
    hg.add_argument("--interval", required=True, type=float)
    hg.add_argument("--offset", type=float, default=0.0)
    hg.add_argument("--actors", action="store_true")
    hg.add_argument("--num-cpus", type=int, default=None)
    hg.set_defaults(fn=cmd_hist)

    pt = sub.add_parser("pct", help="percentiles aggregation (exact "
                                    "quantile_disc values over "
                                    "matching docs)")
    pt.add_argument("--index", required=True)
    pt.add_argument("--query", required=True)
    pt.add_argument("--field", required=True)
    pt.add_argument("--qs", default="0.25,0.5,0.75,0.95",
                    help="comma-separated quantiles in [0,1]")
    pt.add_argument("--actors", action="store_true")
    pt.add_argument("--num-cpus", type=int, default=None)
    pt.set_defaults(fn=cmd_pct)

    cd = sub.add_parser("card", help="cardinality aggregation (HLL "
                                     "distinct count over matching "
                                     "docs; --exact for the true "
                                     "count)")
    cd.add_argument("--index", required=True)
    cd.add_argument("--query", required=True)
    cd.add_argument("--field", required=True)
    cd.add_argument("--exact", action="store_true")
    cd.add_argument("--actors", action="store_true")
    cd.add_argument("--num-cpus", type=int, default=None)
    cd.set_defaults(fn=cmd_card)

    xp = sub.add_parser("explain", help="BM25 score breakdown of one "
                                        "doc under a query "
                                        "(IndexSearcher.explain)")
    xp.add_argument("--index", required=True)
    xp.add_argument("--query", required=True)
    xp.add_argument("--doc", required=True, type=int)
    xp.add_argument("--actors", action="store_true")
    xp.add_argument("--num-cpus", type=int, default=None)
    xp.set_defaults(fn=cmd_explain)

    sg2 = sub.add_parser("sig", help="significant terms (JLH-scored "
                                     "foreground-vs-corpus labels)")
    sg2.add_argument("--index", required=True)
    sg2.add_argument("--query", required=True)
    sg2.add_argument("--field", required=True)
    sg2.add_argument("--k", type=int, default=10)
    sg2.add_argument("--min-doc-count", type=int, default=1)
    sg2.add_argument("--actors", action="store_true")
    sg2.add_argument("--num-cpus", type=int, default=None)
    sg2.set_defaults(fn=cmd_sig)

    fc = sub.add_parser("facet", help="facet counts for a query "
                        "(string dims + numeric ranges)")
    fc.add_argument("--index", required=True)
    fc.add_argument("--query", required=True,
                    help="query string ('' = match-all)")
    fc.add_argument("--dims", default=None,
                    help="comma-separated string dims (default: all "
                         "string meta columns)")
    fc.add_argument("--ranges", default=None,
                    help='JSON {"field": [["label", lo, hi], ...]}')
    fc.add_argument("--max-labels", type=int, default=10)
    fc.add_argument("--actors", action="store_true")
    fc.add_argument("--num-cpus", type=int, default=None)
    fc.set_defaults(fn=cmd_facet)

    mo = sub.add_parser("modify", help="apply create/update/delete ops + commit")
    mo.add_argument("--index", required=True)
    mo.add_argument("--ops", required=True, help="JSON op-array file, or - for stdin")
    mo.add_argument("--num-cpus", type=int, default=None)
    mo.set_defaults(fn=cmd_modify)

    cl = sub.add_parser("clear", help="delete all documents (index stays writable)")
    cl.add_argument("--index", required=True)
    cl.add_argument("--num-cpus", type=int, default=None)
    cl.set_defaults(fn=cmd_clear)

    mg = sub.add_parser("merge", help="fold deltas+tombstones into a clean index")
    mg.add_argument("--index", required=True)
    mg.add_argument("--out", required=True)
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    stt = sub.add_parser("stats", help="print index manifest stats "
                                       "(no Ray session, no data scan)")
    stt.add_argument("--index", required=True)
    stt.set_defaults(fn=cmd_stats)

    cu = sub.add_parser(
        "curate", help="scrub + dedup + decontaminate a documents table "
                       "into partitioned parquet (stage-resumable)")
    cu.add_argument("--input", required=True, help="corpus file or dir")
    cu.add_argument("--format", default="parquet",
                    choices=["parquet", "jsonl", "csv", "wet"],
                    help="input corpus format; jsonl/csv/wet are "
                         "converted to parquet shards under "
                         "<out>/_ingest first")
    cu.add_argument("--out", required=True)
    cu.add_argument("--bench", default=None,
                    help="benchmark parquet (text col) for decontamination")
    cu.add_argument("--langs", default="",
                    help="comma-separated predicted-language allowlist")
    cu.add_argument("--drop-cols", default="",
                    help="comma-separated columns pruned AT THE READ "
                         "(e.g. raw html)")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id",
                    help="row identity for dedup keep-min (string ids "
                         "OK when near-dup is off)")
    cu.add_argument("--near-dup-threshold", type=float, default=0.8)
    cu.add_argument("--no-near-dup", action="store_true")
    cu.add_argument("--num-cpus", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    sy = sub.add_parser(
        "synonyms", help="convert a terminology CSV (Label / Alt Label / "
                         "Parent IRI / Equivalent columns) to Solr synonym "
                         "rules (reference parse_synonyms.py parity)")
    sy.add_argument("--input", required=True, help="terminology CSV")
    sy.add_argument("--out", required=True, help="Solr synonym file")
    sy.add_argument("--overwrite", action="store_true",
                    help="overwrite instead of the default append")
    sy.add_argument("--max-child-depth", type=int, default=0,
                    help="generations of narrower terms to inject "
                         "(0 = alternatives only, negative = unlimited)")
    sy.set_defaults(fn=cmd_synonyms)

    args = p.parse_args(argv)
    try:
        args.fn(args)
    except Exception as e:
        # ValueError is the engine's user-input convention (bad query
        # syntax incl. QueryParseError, unknown fields, bad payloads) —
        # those exit cleanly, as the reference returns HTTP 400, not a
        # stack trace. ILR_DEBUG=1 re-raises so an internal bug that
        # happens to surface as ValueError is not masked.
        if not isinstance(e, ValueError) or os.environ.get("ILR_DEBUG"):
            raise
        print(json.dumps({"error": type(e).__name__, "message": str(e)}),
              file=sys.stderr)
        sys.exit(2)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
