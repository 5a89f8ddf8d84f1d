"""sf1 scale dress rehearsal (12M pages ~= 10x the bench corpus).

Round-4 verdict item #5: build + query + curate-with-near-dup once at
10x the per-round bench scale, recording per-stage walls and peak
object-store use, to surface the next scale cliff before a real
cluster does. Every stage is resumable: the corpus generator caches,
the index build is skipped when its manifest exists, and the curate
pipeline skips stages with a _DONE.json marker — so a crashed run
re-invokes and continues.

Usage:  python scripts/sf1_rehearsal.py [n_pages]
Writes: /tmp/ilr_sf1/rehearsal.json (+ one JSON line on stdout)
"""
from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
ROOT = "/tmp/ilr_sf1"
REPORT = os.path.join(ROOT, "rehearsal.json")


class StorePoller(threading.Thread):
    """Samples object-store usage from the raylet's debug_state.txt
    (refreshed ~10s; grpc-backed memory_summary is unavailable here):
    'pinned objects size' = bytes live in plasma, 'num bytes currently
    spilled' = bytes pushed to disk under store pressure."""

    def __init__(self, period: float = 5.0):
        super().__init__(daemon=True)
        self.period = period
        self.stop_ev = threading.Event()
        self.peak_plasma_mib = 0.0
        self.spilled_mib = 0.0

    def run(self):
        import ray
        try:
            path = os.path.join(
                ray._private.worker.global_worker.node
                .get_session_dir_path(), "logs", "debug_state.txt")
        except Exception:
            return
        while not self.stop_ev.is_set():
            try:
                s = open(path).read()
                m = re.search(r"pinned objects size: (\d+)", s)
                if m:
                    self.peak_plasma_mib = max(
                        self.peak_plasma_mib, int(m.group(1)) / 2**20)
                m = re.search(r"num bytes currently spilled: (\d+)", s)
                if m:
                    self.spilled_mib = max(self.spilled_mib,
                                           int(m.group(1)) / 2**20)
            except Exception:
                pass
            self.stop_ev.wait(self.period)


def main() -> None:
    import numpy as np

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    os.makedirs(ROOT, exist_ok=True)
    report: dict = {"n_pages": N_PAGES, "num_cpus": 32, "stages": {}}
    if os.path.exists(REPORT):
        prior = json.load(open(REPORT))
        # resume only a run of the SAME size — a different n_pages
        # argument starts fresh rather than silently reusing old stages
        if prior.get("n_pages") == N_PAGES:
            report = prior
            report.setdefault("stages", {})

    def save():
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)

    poller = StorePoller()
    poller.start()

    # ---- stage 0: corpus (cached, untimed for the headline) ----------
    import bench
    t0 = time.perf_counter()
    pages = bench._ensure_pages_corpus(N_PAGES)
    report["stages"].setdefault(
        "corpus_gen", {"sec": round(time.perf_counter() - t0, 1),
                       "cached": time.perf_counter() - t0 < 5})
    report["corpus_dir"] = pages
    save()

    # ---- stage 1: index build ----------------------------------------
    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    idx_dir = os.path.join(ROOT, "idx")
    # skip only when the index ARTIFACT exists, not just the report row
    # (a partially-cleaned /tmp must rebuild, not crash at stage 2)
    if "build" not in report["stages"] or not os.path.exists(
            os.path.join(idx_dir, "manifest.json")):
        cfg = EngineConfig(num_segments=32, tokenize_batch_size=2048,
                           analyzed_rows_per_file=16384)
        t0 = time.perf_counter()
        manifest = build_index(pages, idx_dir,
                               meta_cols=["lang", "warc_ts"], config=cfg)
        sec = round(time.perf_counter() - t0, 1)
        report["stages"]["build"] = {
            "sec": sec, "docs_per_sec": round(N_PAGES / sec, 1),
            **{k: v for k, v in manifest.metrics.items()
               if k.startswith("phase")},
            "peak_plasma_mib": poller.peak_plasma_mib,
            "spilled_mib": poller.spilled_mib,
        }
        save()

    # ---- stage 2: query latency over the 12M-page index ---------------
    if "query" not in report["stages"]:
        import pyarrow.dataset as pads

        from icat_lucene_ray.query import And, Index, Or, Term

        idx = Index(idx_dir)
        ts = pads.dataset(idx.manifest.termstats_dir()).to_table(
            columns=["term", "df"]).to_pandas().sort_values(
                "df", ascending=False)
        head = ts["term"].iloc[:5].tolist()
        mid_lo, mid_hi = len(ts) // 4, len(ts) // 2
        mid = ts["term"].iloc[
            mid_lo:mid_hi:max(1, (mid_hi - mid_lo) // 40)].tolist()[:40]
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
        report["stages"]["query"] = {
            "sec": round(time.perf_counter() - t0, 1),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
            "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        }
        save()

    # ---- stage 3: curate with near-dup ---------------------------------
    # Same shape as the recorded r04 1.2M run: drop raw html at the read,
    # string url ids, near-dup on (MinHash default threshold 0.8).
    # scheme="auto" (the CurateConfig default): length-stratified
    # MinHash — one-permutation speed on this corpus's long pages (avg
    # ~220 tokens), classic perm estimator on the short tail (p10=45
    # tokens) so densified signatures don't flood the verify stage
    # with false candidates (measured 13 -> 2.1M pairs under pure oph).
    if "curate" not in report["stages"]:
        from icat_lucene_ray.pipelines.curate import CurateConfig, curate

        cur_cfg = CurateConfig(id_col="url", drop_cols=("html",),
                               near_dup_threshold=0.8,
                               minhash_scheme="auto")
        t0 = time.perf_counter()
        rep = curate(pages, os.path.join(ROOT, "curate"),
                     bench=None, cfg=cur_cfg)
        report["stages"]["curate"] = {
            "sec": round(time.perf_counter() - t0, 1),
            "per_stage": {k: v.get("sec") for k, v in
                          rep["stages"].items()},
            "rows": {k: v.get("rows") for k, v in rep["stages"].items()},
            "peak_plasma_mib": poller.peak_plasma_mib,
            "spilled_mib": poller.spilled_mib,
        }
        save()

    poller.stop_ev.set()
    report["peak_plasma_mib"] = poller.peak_plasma_mib
    report["spilled_mib"] = poller.spilled_mib
    save()
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
