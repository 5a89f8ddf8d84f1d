"""Positions cost study (BASELINE.md): measure index size and build
throughput of ``EngineConfig(positions=True)`` vs the phrase-lite
default on the bench pages corpus, so the default is a documented
tradeoff.

Usage: python scripts/positions_cost.py [n_pages]  (default 300000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main(n_pages: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _ensure_pages_corpus

    from icat_lucene_ray.config import EngineConfig
    from icat_lucene_ray.index.build import build_index

    pages = _ensure_pages_corpus(n_pages)
    out = {"n_pages": n_pages}
    # warm-up build to absorb the session's cold fault tax (BASELINE.md)
    shutil.rmtree("/tmp/ilr_bench/idx_pos_warm", ignore_errors=True)
    build_index(pages, "/tmp/ilr_bench/idx_pos_warm",
                meta_cols=["lang"], config=EngineConfig(num_segments=16))
    for positions, tag in [(False, "lite"), (True, "positions")]:
        idx_dir = f"/tmp/ilr_bench/idx_pos_{tag}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        cfg = EngineConfig(num_segments=16, positions=positions)
        t0 = time.perf_counter()
        build_index(pages, idx_dir, meta_cols=["lang"], config=cfg)
        sec = time.perf_counter() - t0
        out[f"build_sec_{tag}"] = round(sec, 2)
        out[f"docs_per_sec_{tag}"] = round(n_pages / sec, 1)
        out[f"index_bytes_{tag}"] = du(os.path.join(idx_dir, "segments"))
    out["size_ratio"] = round(
        out["index_bytes_positions"] / out["index_bytes_lite"], 3)
    out["throughput_ratio"] = round(
        out["docs_per_sec_positions"] / out["docs_per_sec_lite"], 3)
    ray.shutdown()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    print(json.dumps(main(n)))
