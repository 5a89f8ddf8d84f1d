"""Bench helper kernels importable inside Ray workers.

``tokenize_count`` drives the analysis hot path (Arrow re2 split +
memoized stem expansion + term-frequency fold) over a zero-copy slice
of a shared plasma table — the per-worker analyzer singleton makes
repeat calls allocation-light, which is what a CPU-scaling probe
needs on this sandbox (see BASELINE.md environment caveat).
"""

from __future__ import annotations

_VAN = None


def tokenize_count(tbl, lo: int, hi: int) -> int:
    global _VAN
    if _VAN is None:
        from icat_lucene_ray.analysis import get_analyzer
        from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer

        _VAN = VectorizedAnalyzer(get_analyzer("icat"))
    total = 0
    # 2048-doc sub-batches keep the kernel's working set cache-resident
    # (one 8k-doc batch is ~30 MB of sort keys — DRAM-bound at 32-way)
    for s in range(lo, hi, 2048):
        sl = tbl.slice(s, min(2048, hi - s))
        _offsets, _terms, _tfs, doc_lens = _VAN.term_freq_batch(sl["text"])
        total += int(doc_lens.sum())
    return total
