"""Index manifest — the segment registry.

Plays the role of the reference's in-memory ``indexBuckets`` registry +
commit points (``Lucene.java:458``, commit/refresh ``Lucene.java:163-171``):
a query sees exactly the immutable segments listed in the manifest.
Also carries global collection statistics (N, avgdl, hot-term table)
that BM25 scoring needs, per-phase lineage for resume, and build
metrics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"
FORMAT_VERSION = 1


@dataclass
class IndexManifest:
    root: str
    analyzer: str = "icat"
    analyzer_version: str = ""
    config: dict = field(default_factory=dict)
    num_docs: int = 0
    avgdl: float = 0.0
    total_tokens: int = 0
    min_doc: int = 0
    max_doc: int = 0
    num_segments: int = 0
    # term -> {"df": int, "n_salt": int} for doc-range-salted head terms
    hot_terms: dict[str, dict] = field(default_factory=dict)
    segments: list[dict] = field(default_factory=list)
    doc_table: str = "analyzed"
    termstats: str = "termstats"
    meta_cols: list[str] = field(default_factory=list)
    #: indexed text fields (M2). len>1 → posting terms are field-prefixed
    #: ("{field}:{stem}") and ``field_stats`` carries per-field
    #: {"total_tokens", "avgdl"} for per-field BM25 normalization.
    text_fields: list[str] = field(default_factory=list)
    field_stats: dict[str, dict] = field(default_factory=dict)
    id_col: str = "doc_id"
    #: "explicit": doc_id is a physical column of the doc store.
    #: "dense": doc_id = base(file) + row — Lucene-ordinal-style dense
    #: ids; ``id_files`` lists [relpath, rows] in id order and bases are
    #: their prefix sums. (At extreme file counts this list moves to a
    #: parquet sidecar; list-in-manifest is fine to ~100k files.)
    id_assignment: str = "explicit"
    id_files: list[list] = field(default_factory=list)
    lineage: dict[str, Any] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)
    #: commit generation (0 = initial bulk build); bumped by every
    #: IndexUpdater.commit ≈ a Lucene commit point (Lucene.java:571-587)
    generation: int = 0
    #: committed delta generations, oldest first; each entry:
    #: {"gen", "doc_dir", "seg_prefix", "segments": [...],
    #:  "tombstones": path|None, "n_created", "n_deleted"}
    deltas: list[dict] = field(default_factory=list)
    format_version: int = FORMAT_VERSION

    # ------------------------------------------------------------------
    def path(self) -> str:
        return os.path.join(self.root, MANIFEST_NAME)

    def save(self) -> None:
        d = {k: v for k, v in self.__dict__.items() if k != "root"}
        tmp = self.path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f, indent=1)
        os.replace(tmp, self.path())  # atomic publish ≈ Lucene commit point

    @staticmethod
    def load(root: str) -> "IndexManifest":
        with open(os.path.join(root, MANIFEST_NAME)) as f:
            d = json.load(f)
        if d.get("format_version", 0) != FORMAT_VERSION:
            raise ValueError(
                f"index format {d.get('format_version')} != engine {FORMAT_VERSION}"
            )
        return IndexManifest(root=root, **d)

    # convenience -------------------------------------------------------
    def doc_table_dir(self) -> str:
        return os.path.join(self.root, self.doc_table)

    def termstats_dir(self) -> str:
        return os.path.join(self.root, self.termstats)

    def segment_path(self, seg_id: int) -> str:
        return os.path.join(self.root, "segments", f"seg_{seg_id:05d}.parquet")

    def delta_segment_path(self, gen: int, seg_id: int) -> str:
        return os.path.join(self.root, "segments",
                            f"delta_{gen:05d}_{seg_id:05d}.parquet")
