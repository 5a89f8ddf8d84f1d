"""Benchmark harness.

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``
and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the same job twice in fresh processes at 8 and 32
CPUs on the same input and reports both throughputs + scaling
efficiency (the sandbox stand-in for the north_rule's N vs 4N node
clusters).

Components:
  q_build        index build over a cached deterministic synthetic pages
                 corpus (Zipf vocab, ~216 tokens/doc) — the headline
                 docs/sec number
  q_build_docs   index build over {sf}/documents.parquet
  q_query        200 BM25 searches (term/AND/OR across the df spectrum)
                 p50/p99 reported in extras
  q_minhash      MinHash-LSH near-dup over documents
  q_ann          brute-force cosine top-k over embeddings
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time

#: bench corpus size scales with the sf dir's documents table; sized so
#: the build is compute-bound (fixed per-job overhead < ~5% at 8 CPUs),
#: which the scaling-efficiency criterion needs
PAGES_PER_DOCROW = 240  # sf0.1 (5000 docs) -> 1.2M pages (~2 GB)


def _quiet():
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _ensure_pages_corpus(n_docs: int, cache_root: str = "/tmp/ilr_bench") -> str:
    """Deterministic synthetic CC-style corpus, generated in parallel
    once and cached on disk (untimed; both scaling runs share it)."""
    import ray

    out = os.path.join(cache_root, f"pages_{n_docs}")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    import pyarrow.parquet as pq

    @ray.remote
    def gen_chunk(start: int, n: int, path: str):
        from icat_lucene_ray.corpus import generate_pages

        t = generate_pages(n, start_doc=start)
        pq.write_table(t, path, compression="zstd")
        return path

    chunk = 5000
    futs = [
        gen_chunk.remote(s, min(chunk, n_docs - s),
                         os.path.join(out, f"pages_{s // chunk:05d}.parquet"))
        for s in range(0, n_docs, chunk)
    ]
    ray.get(futs)
    with open(marker, "w") as f:
        f.write(str(n_docs))
    return out


def _compute_probe(pages_dir: str, num_cpus: int, passes: int = 15) -> dict:
    """Pure-CPU tokenize kernel over a shared in-plasma table: near-zero
    fresh allocation per task, so it isolates the engine's CPU scaling
    from this sandbox's serialized guest-memory fault service
    (~120-320 MB/s regardless of parallelism; BASELINE.md caveat).
    Assumes ray is initialized."""
    import time as _t

    import pyarrow as pa
    import pyarrow.parquet as pq2

    import ray

    pfiles = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
                    if f.endswith(".parquet"))[:28]
    probe_tbl = pa.concat_tables(
        [pq2.read_table(f, columns=["text"]) for f in pfiles])
    probe_ref = ray.put(probe_tbl)

    @ray.remote
    def _tok_probe(tref, lo, hi):
        import icat_lucene_ray.bench_kernels as bk

        return bk.tokenize_count(tref, lo, hi)

    n_rows = probe_tbl.num_rows
    chunk = 8192
    slices = [(s, min(s + chunk, n_rows)) for s in range(0, n_rows, chunk)]
    ray.get([_tok_probe.remote(probe_ref, s, e) for s, e in slices])  # warm
    t0 = _t.perf_counter()
    ray.get([_tok_probe.remote(probe_ref, s, e)
             for _ in range(passes) for s, e in slices])
    sec = _t.perf_counter() - t0
    docs = n_rows * passes
    return {"probe_docs": docs,
            "probe_docs_per_sec": round(docs / sec, 1)}


def run_probe_only(ncpu: int) -> dict:
    import ray

    _quiet()
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import pyarrow.parquet as pq2

    n_docrows = pq2.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    pages = _ensure_pages_corpus(n_docrows * PAGES_PER_DOCROW)
    out = {"num_cpus": ncpu, **_compute_probe(pages, ncpu)}
    ray.shutdown()
    return out


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import numpy as np
    import ray

    _quiet()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq
    import ray.data

    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index
    from icat_lucene_ray.query import And, Index, Or, Term

    n_docrows = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_pages = n_docrows * PAGES_PER_DOCROW
    pages = _ensure_pages_corpus(n_pages)
    # warm page cache so both scaling levels measure compute, not disk
    for p in sorted(os.listdir(pages)):
        if p.endswith(".parquet"):
            with open(os.path.join(pages, p), "rb") as f:
                while f.read(1 << 22):
                    pass

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- q_build: synthetic pages corpus -----------------------------
    idx_dir = f"/tmp/ilr_bench/idx_pages_{num_cpus}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    # FIXED segment count at every parallelism level: a cluster sizes S
    # for the data, not per-run CPUs — and the scaling comparison must
    # measure identical work (round-1 bench used max(16, num_cpus),
    # which made the 8- and 32-CPU runs build different indexes)
    cfg = EngineConfig(num_segments=32,
                       tokenize_batch_size=2048,
                       analyzed_rows_per_file=16384)
    t0 = time.perf_counter()
    manifest = build_index(pages, idx_dir, meta_cols=["lang", "warc_ts"],
                           config=cfg)
    queries["q_build"] = round(time.perf_counter() - t0, 3)
    extras["build_docs_per_sec"] = round(n_pages / queries["q_build"], 1)
    extras["build_n_docs"] = n_pages
    extras.update({f"build_{k}": v for k, v in manifest.metrics.items()
                   if k.startswith("phase")})

    # ---- q_build_docs: sf documents table ----------------------------
    docs_idx = f"/tmp/ilr_bench/idx_docs_{num_cpus}"
    shutil.rmtree(docs_idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(os.path.join(sf_dir, "documents.parquet"), docs_idx,
                text_col="text", id_col="doc_id",
                meta_cols=["lang", "source", "n_chars"],
                config=EngineConfig(analyzer="simple", num_segments=8))
    queries["q_build_docs"] = round(time.perf_counter() - t0, 3)

    # ---- q_query: BM25 latency over the pages index ------------------
    idx = Index(idx_dir)
    import pyarrow.dataset as pads

    ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
        columns=["term", "df"]).to_pandas().sort_values("df", ascending=False)
    # df-spectrum query mix, quantile-based so it works at any corpus size
    head = ts["term"].iloc[:5].tolist()
    mid_lo, mid_hi = len(ts) // 4, len(ts) // 2
    mid = ts["term"].iloc[mid_lo:mid_hi:max(1, (mid_hi - mid_lo) // 40)].tolist()[:40]
    rare = ts["term"].iloc[-40:].tolist()
    qset = []
    for i in range(200):
        r = i % 4
        if r == 0:
            qset.append(Term(mid[i % len(mid)]))
        elif r == 1:
            qset.append(And([Term(mid[i % len(mid)]),
                             Term(head[i % len(head)])]))
        elif r == 2:
            qset.append(Or([Term(mid[i % len(mid)]),
                            Term(rare[i % len(rare)])]))
        else:
            qset.append(Term(head[i % len(head)]))
    lat = []
    t0 = time.perf_counter()
    for q in qset:
        s = time.perf_counter()
        idx.search(q, k=10)
        lat.append(time.perf_counter() - s)
    queries["q_query"] = round(time.perf_counter() - t0, 3)
    extras["query_p50_ms"] = round(float(np.percentile(lat, 50)) * 1e3, 2)
    extras["query_p99_ms"] = round(float(np.percentile(lat, 99)) * 1e3, 2)

    # ---- q_qps: concurrent throughput on the actor-pool serving path --
    # (ST1 at cluster shape: SegmentActors own segment subsets; 8 driver
    # threads keep the pool busy — the serving-node concurrency story,
    # not another latency number)
    from concurrent.futures import ThreadPoolExecutor

    aidx = Index(idx_dir, use_actors=True, num_actors=8)
    aidx.search(qset[0], k=10)  # spawn + warm the pool
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda q: aidx.search(q, k=10), qset))
    dt = time.perf_counter() - t0
    queries["q_qps_actor"] = round(dt, 3)
    extras["query_actor_qps"] = round(len(qset) / dt, 1)

    # ---- q_facet: cached-sidecar facet counting (ST2) ------------------
    # first call loads the sidecar (timed separately); steady-state facet
    # cost is O(|candidates|) bincount, NOT a doc-store scan
    t0 = time.perf_counter()
    idx.facets(Term(head[0]), dims=["lang"])
    extras["facet_first_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    t0 = time.perf_counter()
    for i in range(20):
        idx.facets(Term(mid[i % len(mid)]), dims=["lang"])
    queries["q_facet"] = round(time.perf_counter() - t0, 3)
    extras["facet_p50_ms"] = round(queries["q_facet"] / 20 * 1e3, 2)

    # ---- q_minhash: near-dup over documents --------------------------
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    res = minhash_lsh_dedup(docs, threshold=0.8)
    queries["q_minhash"] = round(time.perf_counter() - t0, 3)
    extras["minhash_dropped"] = res["n_drop"]

    # ---- q_ann: cosine top-k over embeddings -------------------------
    from icat_lucene_ray.ops.similarity import brute_force_topk

    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = np.vstack([np.asarray(v, dtype=np.float64) for v in
                    emb.limit(16).to_pandas()["embedding"]])
    t0 = time.perf_counter()
    brute_force_topk(emb, qv, k=10)
    queries["q_ann"] = round(time.perf_counter() - t0, 3)

    # ---- export / mlt (extras only: new surfaces measured without
    # changing the round-comparable headline sum) ----------------------
    from icat_lucene_ray.query import Filter

    t0 = time.perf_counter()
    for d in range(20):
        idx.more_like_this(d * 1000, k=10, min_doc_freq=2)
    extras["mlt_p50_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 2)
    exp_dir = "/tmp/ilr_bench/export_term"
    shutil.rmtree(exp_dir, ignore_errors=True)
    t0 = time.perf_counter()
    idx.matches_dataset(Term(mid[0]), columns=["lang"],
                        with_score=True).write_parquet(exp_dir)
    extras["export_term_sec"] = round(time.perf_counter() - t0, 3)
    exp_dir = "/tmp/ilr_bench/export_filter"
    shutil.rmtree(exp_dir, ignore_errors=True)
    t0 = time.perf_counter()
    idx.matches_dataset(Filter("lang", "en"),
                        columns=["url", "lang"]).write_parquet(exp_dir)
    dt = time.perf_counter() - t0
    n_exp = sum(
        pq.ParquetFile(os.path.join(exp_dir, f)).metadata.num_rows
        for f in os.listdir(exp_dir) if f.endswith(".parquet"))
    extras["export_filter_sec"] = round(dt, 3)
    extras["export_filter_rows_per_sec"] = round(n_exp / dt, 1)

    # ---- round-5 query-algebra surfaces (extras only) -----------------
    from icat_lucene_ray.query import DisMax

    t0 = time.perf_counter()
    for i in range(20):
        idx.search(Term(mid[i % len(mid)]), k=10, collapse="lang")
    extras["collapse_p50_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)
    t0 = time.perf_counter()
    for i in range(20):
        idx.search(DisMax([Term(mid[i % len(mid)]),
                           Term(head[i % len(head)])], tie=0.3), k=10)
    extras["dismax_p50_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)
    t0 = time.perf_counter()
    for i in range(20):
        idx.aggregate_stats(Term(mid[i % len(mid)]), "warc_ts")
    extras["agg_stats_p50_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)
    t0 = time.perf_counter()
    idx.histogram(Term(mid[0]), "warc_ts", 86_400e6)
    extras["hist_ms"] = round((time.perf_counter() - t0) * 1e3, 2)

    from icat_lucene_ray.ops.text import substring_dedup

    t0 = time.perf_counter()
    substring_dedup(
        ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"]),
        min_len=5).count()
    extras["substring_dedup_sec"] = round(time.perf_counter() - t0, 3)

    # ---- round-5 (late) surfaces: match aggregations, explain, NB, PQ -
    t0 = time.perf_counter()
    idx.percentiles(Term(mid[0]), "warc_ts", [0.25, 0.5, 0.95])
    extras["percentiles_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    idx.cardinality(Term(mid[0]), "lang")
    extras["cardinality_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    for i in range(20):
        idx.significant_terms(Term(mid[i % len(mid)]), "lang")
    extras["sig_terms_p50_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)
    hit = int(idx.search(Term(mid[0]), k=1).table["doc_id"][0].as_py())
    t0 = time.perf_counter()
    for i in range(20):
        idx.explain(Or([Term(mid[0]), Term(head[0])]), hit)
    extras["explain_p50_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2)

    import pyarrow as pa

    from icat_lucene_ray.ops.classify import nb_predict, nb_train

    labeled = docs.map_batches(
        lambda b: b.append_column("label", pa.array(
            np.where(b["doc_id"].to_numpy(zero_copy_only=False) % 3
                     == 0, "pos", "neg"))),
        batch_format="pyarrow")
    t0 = time.perf_counter()
    model = nb_train(labeled, "text", "label")
    nb_predict(labeled, model, "text", "doc_id") \
        .map_batches(lambda b: pa.table(
            {"n": [b.num_rows]}), batch_format="pyarrow").count()
    extras["nb_train_score_sec"] = round(time.perf_counter() - t0, 3)

    from icat_lucene_ray.ops.similarity import (
        build_pq_index, pq_index_topk)

    pq_dir = f"/tmp/ilr_bench/pq_{num_cpus}"
    shutil.rmtree(pq_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_pq_index(emb, pq_dir, m_sub=8, n_centroids=256,
                   ivf_clusters=16)
    extras["pq_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    pq_index_topk(pq_dir, qv, k=10, nprobe=4)
    extras["pq_query_sec"] = round(time.perf_counter() - t0, 3)

    # ---- compute-path scaling probe ----------------------------------
    probe = _compute_probe(pages, num_cpus)
    extras.update(probe)

    result = {
        "metric": "icat_lucene_ray headline: index build + BM25 query + "
                  "dedup + ann over sf dir",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extras,
    }
    ray.shutdown()
    return result


def run_insession(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """End-to-end build at BOTH parallelism levels inside ONE Ray
    session (``build_index(cpu_budget=...)`` emulates the smaller
    cluster by inflating per-task num_cpus). Two fresh sessions land in
    different host memory-fault regimes — identical 8-CPU builds have
    measured 6.4k-21.0k docs/s across rounds — so only a same-session
    pair (after one untimed warm-up build that pays the cold fault tax)
    measures the ENGINE's end-to-end scaling. BASELINE.md caveat has the
    full attribution."""
    import pyarrow.parquet as pq2

    import ray

    _quiet()
    ray.init(address="local", num_cpus=hi, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    n_docrows = pq2.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_pages = n_docrows * PAGES_PER_DOCROW
    pages = _ensure_pages_corpus(n_pages)
    cfg = EngineConfig(num_segments=32, tokenize_batch_size=2048,
                       analyzed_rows_per_file=16384)

    def one(budget: int, tag: str) -> float:
        idx_dir = f"/tmp/ilr_bench/idx_insession_{tag}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(pages, idx_dir, meta_cols=["lang", "warc_ts"],
                    config=cfg, cpu_budget=budget)
        return time.perf_counter() - t0

    one(hi, "warm")  # untimed: pays the session's cold fault tax
    sec_lo = one(lo, "lo")
    sec_hi = one(hi, "hi")
    probe = _compute_probe(pages, hi)
    ray.shutdown()
    dps_lo, dps_hi = n_pages / sec_lo, n_pages / sec_hi
    return {
        "in_session_cpus_lo": lo, "in_session_cpus_hi": hi,
        "in_session_build_sec_lo": round(sec_lo, 3),
        "in_session_build_sec_hi": round(sec_hi, 3),
        "in_session_build_docs_per_sec_lo": round(dps_lo, 1),
        "in_session_build_docs_per_sec_hi": round(dps_hi, 1),
        "in_session_scaling_efficiency": round((dps_hi / dps_lo)
                                               / (hi / lo), 3),
        "in_session_probe_docs_per_sec": probe["probe_docs_per_sec"],
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same job, two parallelism levels, fresh processes (BASELINE.md
    scaling criterion: efficiency ≥ 0.8 between N and 4N)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = one(lo), one(hi)
    # efficiency on the distributed build (the cluster-bound phase)
    t_lo, t_hi = r_lo["queries"]["q_build"], r_hi["queries"]["q_build"]
    eff = (t_lo / t_hi) / (hi / lo)
    p_eff = (r_hi["probe_docs_per_sec"] / r_lo["probe_docs_per_sec"]) \
        / (hi / lo)
    # N=2 -> 4N=8 compute pair: inside one box, the 8->32 pair conflates
    # engine scaling with turbo/shared-LLC/DRAM effects that a real
    # N-node -> 4N-node cluster does not have (each node brings its own
    # caches and memory); the low pair isolates engine behavior
    probe2 = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", "2"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ),
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".").stdout
    r2 = json.loads(probe2.strip().splitlines()[-1])
    p_eff_2_8 = (r_lo["probe_docs_per_sec"] / r2["probe_docs_per_sec"]) \
        / (lo / 2)
    # in-session end-to-end pair: same Ray session for both levels, so
    # the host's per-session fault-regime swing cancels (fresh process
    # so its plasma store starts clean)
    ins_out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--insession"],
        capture_output=True, text=True, check=True,
        env=dict(os.environ),
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".").stdout
    ins = json.loads(ins_out.strip().splitlines()[-1])
    return {
        **ins,
        "metric": "scaling efficiency (same input, fresh ray sessions)",
        "cpus_lo": lo, "cpus_hi": hi,
        "build_sec_lo": t_lo, "build_sec_hi": t_hi,
        "build_docs_per_sec_lo": r_lo["build_docs_per_sec"],
        "build_docs_per_sec_hi": r_hi["build_docs_per_sec"],
        "total_sec_lo": r_lo["value"], "total_sec_hi": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        # compute-path probe: engine CPU scaling isolated from the
        # sandbox's serialized guest-memory fault service (BASELINE.md)
        "probe_docs_per_sec_2": r2["probe_docs_per_sec"],
        "probe_docs_per_sec_lo": r_lo["probe_docs_per_sec"],
        "probe_docs_per_sec_hi": r_hi["probe_docs_per_sec"],
        "compute_scaling_efficiency_lo_hi": round(p_eff, 3),
        "compute_scaling_efficiency_2_8": round(p_eff_2_8, 3),
        "sf": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    elif "--insession" in sys.argv:
        i = sys.argv.index("--insession")
        lo, hi = (int(sys.argv[i + 1]), int(sys.argv[i + 2])) \
            if len(sys.argv) > i + 2 else (8, 32)
        print(json.dumps(run_insession(sf_dir, lo, hi)))
    elif "--probe" in sys.argv:
        n = int(sys.argv[sys.argv.index("--probe") + 1])
        print(json.dumps(run_probe_only(n)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))
