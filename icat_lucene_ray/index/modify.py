"""Incremental index modification — the reference's write path.

Reimplements ``POST /modify`` (``Lucene.java:481-513``): a batch of
``create`` / ``update`` / ``delete`` operations buffers in the updater
and becomes durable AND visible only at :meth:`IndexUpdater.commit`
(≈ the commit/refresh cycle, ``Lucene.java:571-587,163-171`` — SURVEY.md
§2.9 "commit happens-before search visibility").

Mechanics (LSM-style, because our segments are immutable):

- ``delete`` / the old version of an ``update`` become **tombstones** —
  a parquet file of doc_ids per generation. A tombstone written at
  generation g masks postings and doc-store rows of every generation
  < g, so a doc updated at g2 after g1 resolves to the g2 version.
- ``create`` / the new version of an ``update`` become a **delta
  generation**: one analyzed doc-store file + delta segment files
  (same codec, same term→segment routing and hot-term salt map as the
  base build, so the query side unions slices with ordered concat).
- ``commit()`` writes all delta files first, then atomically replaces
  ``manifest.json`` (the commit point). A crash mid-commit leaves
  orphan files that no manifest references — harmless.

Stat semantics (documented divergence): ``num_docs`` / ``avgdl`` are
updated **exactly** at each commit, while per-term ``df`` still counts
tombstoned docs until :func:`force_merge` rewrites the segments —
the same staleness Lucene exhibits between deletes and merges.

``delete_by_query`` ≈ D2 (``Lucene.java:301-317``); ``force_merge``
≈ Lucene's segment merge: per-segment Ray tasks decode base + delta
postings, drop tombstoned docs, and re-encode a clean generation-0
index into a new directory.
"""

from __future__ import annotations

import os
import uuid
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray

from icat_lucene_ray.analysis import get_analyzer
from icat_lucene_ray.config import EngineConfig
from icat_lucene_ray.index.build import RunEncoder, SegmentWriter
from icat_lucene_ray.index.codec import decode_u64_blocks, encode_postings_multi
from icat_lucene_ray.index.docids import hash_ids_from_strings
from icat_lucene_ray.index.manifest import IndexManifest


class IndexUpdater:
    """Buffered create/update/delete over an existing index directory.

    Documents are plain dicts with the index's text column plus any
    ``meta_cols``; the id comes from the manifest's ``id_col`` if
    present in the doc, else it is hashed from the key column (same
    rule as the bulk build). Nothing is visible until :meth:`commit`.
    """

    def __init__(self, root: str, text_col: str = "text"):
        self.root = root
        self.m = IndexManifest.load(root)
        self.cfg = EngineConfig.from_dict(self.m.config)
        self.text_col = text_col
        self._creates: list[dict] = []
        #: pre-analyzed one-row doc-store tables (increment_statistics —
        #: the postings are copied, not re-derived from raw text)
        self._preanalyzed: list[pa.Table] = []
        self._deletes: list[int] = []
        self._idx = None
        self._next_fresh = int(self.m.max_doc) + 1

    # ---------------- op surface (S1 modify, Lucene.java:484-513) ------
    def create(self, doc: dict) -> None:
        self._creates.append(dict(doc))

    def update(self, doc: dict) -> None:
        """Delete-then-add by id ≈ updateDocument (Lucene.java:327-330).
        Like Lucene's IndexWriter, the delete also applies to documents
        still buffered in THIS batch (same id or same key supersedes the
        pending create); unknown keys degrade to a plain create."""
        d = dict(doc)
        # supersede a pending uncommitted create with the same identity
        idc = self.m.id_col
        key_col = next((c for c in ("url", *self.m.meta_cols) if c in d), None)
        same_id = d.get(idc)
        same_key = d.get(key_col) if key_col else None
        self._creates = [
            c for c in self._creates
            if not ((same_id is not None and c.get(idc) == same_id)
                    or (same_key is not None and c.get(key_col) == same_key))
        ]
        did = self._doc_id_of(d)
        if did is not None:
            self._deletes.append(did)
            d[idc] = did
        self._creates.append(d)

    def delete(self, doc_id: int) -> None:
        self._deletes.append(int(doc_id))

    def modify(self, ops: list[dict]) -> None:
        """Reference op-array shape: [{"create": doc} | {"update": doc}
        | {"delete": id}, ...]."""
        for op in ops:
            if "create" in op:
                self.create(op["create"])
            elif "update" in op:
                self.update(op["update"])
            elif "delete" in op:
                self.delete(op["delete"])
            else:
                raise ValueError(f"unknown op {sorted(op)}")

    def increment_statistics(self, key: dict, deltas: dict) -> bool:
        """M8 ``aggregateFileSize`` / ``incrementFileStatistic`` +
        ``pruneDocument`` (``Lucene.java:660-721,1734-1750``): add the
        deltas to the named numeric stored fields of ONE document —
        every other field (including the analyzed postings) is carried
        over unchanged, so the text is never re-analyzed. No-op (returns
        False) when no document matches, like the reference. Visible at
        :meth:`commit`."""
        import pyarrow.dataset as _pads

        from icat_lucene_ray.query.engine import Index

        did = self._doc_id_of(key)
        if did is None:
            return False
        if self._idx is None:
            self._idx = Index(self.root)
        cols = [f.name for f in self._idx._doc_sources[0][1].schema]
        if "doc_id" not in cols:
            cols = ["doc_id"] + cols
        t = self._idx._doc_store_table(
            columns=cols, filter=_pads.field("doc_id") == did)
        if t.num_rows == 0:
            return False
        t = t.slice(t.num_rows - 1, 1)
        arrays = {}
        for c in t.column_names:
            if c in deltas:
                old = t[c][0].as_py() or 0
                arrays[c] = pa.array([old + deltas[c]],
                                     t.schema.field(c).type)
            else:
                arrays[c] = t[c]
        self._deletes.append(int(did))
        self._preanalyzed.append(pa.table(arrays))
        return True

    def delete_by_query(self, q) -> int:
        """D2: evaluate a query against the CURRENT committed state and
        tombstone every hit (Lucene.java:301-317). Returns hit count."""
        from icat_lucene_ray.query.engine import Index

        docs, _ = Index(self.root)._eval(q)
        self._deletes.extend(int(d) for d in docs)
        return len(docs)

    # ---------------- commit (ST4) -------------------------------------
    def _doc_id_of(self, doc: dict, create: bool = False) -> int | None:
        """Resolve a doc's id: explicit id column if present; in dense-id
        indexes, look the key column up in the committed doc store (≈
        the reference's delete-by-id term lookup); fresh creates get the
        next dense id. Returns None for an update whose key is unknown
        (treated as a plain create)."""
        idc = self.m.id_col
        if idc in doc and doc[idc] is not None:
            return int(doc[idc])
        key_col = next((c for c in ("url", *self.m.meta_cols)
                        if c in doc), None)
        if key_col is None:
            raise ValueError(f"doc needs {idc!r} or a key column")
        if getattr(self.m, "id_assignment", "explicit") == "dense":
            if create:
                # a plain create ALWAYS allocates a fresh dense id
                # (reference addDocument semantics, Lucene.java:496-499) —
                # reusing a committed id here would leave two live doc-store
                # rows under one doc_id and break the unique-sorted-id
                # invariant the query engine relies on
                nid = self._next_fresh
                self._next_fresh += 1
                return nid
            return self._lookup_key(key_col, doc[key_col])
        return int(hash_ids_from_strings([doc[key_col]])[0])

    def _lookup_key(self, key_col: str, value) -> int | None:
        import pyarrow.dataset as _pads

        from icat_lucene_ray.query.engine import Index

        if self._idx is None:
            self._idx = Index(self.root)
        t = self._idx._doc_store_table(
            columns=[key_col], filter=_pads.field(key_col) == value)
        if t.num_rows == 0:
            return None
        return int(t["doc_id"][t.num_rows - 1].as_py())

    def _text_fields(self) -> list[str]:
        tf = list(getattr(self.m, "text_fields", None) or [])
        return tf if tf else [self.text_col]

    def _analyze_creates(self) -> pa.Table:
        from icat_lucene_ray.analysis.vectorized import VectorizedAnalyzer
        from icat_lucene_ray.index.build import merge_field_tokens

        van = VectorizedAnalyzer(get_analyzer(self.m.analyzer))
        ids = pa.array([self._doc_id_of(d, create=True)
                        for d in self._creates], pa.int64())
        tcols = self._text_fields()
        cols: dict[str, Any] = {"doc_id": ids}
        if len(tcols) > 1:
            batch = pa.table({
                c: pa.array([d.get(c) or "" for d in self._creates],
                            pa.string()) for c in tcols})
            cols.update(merge_field_tokens(van, batch, tcols))
        elif self.cfg.positions:
            from icat_lucene_ray.index.build import tokenize_with_positions

            texts = pa.array([d.get(tcols[0]) or "" for d in self._creates])
            cols.update(tokenize_with_positions(van, texts))
        else:
            texts = pa.array([d.get(tcols[0]) or "" for d in self._creates])
            offsets, terms, tfs, doc_lens = van.term_freq_batch(texts)
            off32 = pa.array(offsets, type=pa.int32())
            cols["doc_len"] = pa.array(doc_lens)
            cols["terms"] = pa.ListArray.from_arrays(off32, terms)
            cols["tfs"] = pa.ListArray.from_arrays(off32, pa.array(tfs))
        for c in self.m.meta_cols:
            cols[c] = pa.array([d.get(c) for d in self._creates])
        return pa.table(cols)

    def commit(self) -> IndexManifest:
        """Make buffered ops durable and visible (new manifest
        generation). No-op if nothing is buffered."""
        if not self._creates and not self._preanalyzed \
                and not self._deletes:
            return self.m
        m = self.m
        gen = m.generation + 1
        entry: dict[str, Any] = {"gen": gen, "doc_dir": None,
                                 "seg_prefix": f"delta_{gen:05d}",
                                 "segments": [], "tombstones": None,
                                 "n_created": (len(self._creates)
                                               + len(self._preanalyzed)),
                                 "n_deleted": 0}

        # -------- tombstones (dedup, keep order-independent) ----------
        tomb = np.unique(np.asarray(self._deletes, dtype=np.int64))
        # liveness + doc_len of the tombstoned docs, for exact stats:
        # one pruned (doc_id, doc_len) scan of the committed doc store
        removed_tokens = 0
        n_removed = 0
        tcols = self._text_fields()
        multi = len(tcols) > 1
        removed_f = {f: 0 for f in tcols}
        if len(tomb):
            from icat_lucene_ray.query.engine import Index

            idx = Index(self.root)
            cols = ["doc_id", "doc_len"] + \
                ([f"dl__{f}" for f in tcols] if multi else [])
            t = idx._doc_store_table(columns=cols)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            dls = t["doc_len"].to_numpy(zero_copy_only=False)
            hit = np.isin(ids, tomb)
            n_removed = int(hit.sum())
            removed_tokens = int(dls[hit].sum())
            if multi:
                for f in tcols:
                    removed_f[f] = int(
                        t[f"dl__{f}"].to_numpy(zero_copy_only=False)
                        .astype(np.int64)[hit].sum())
            os.makedirs(os.path.join(self.root, "deletes"), exist_ok=True)
            tpath = os.path.join(self.root, "deletes",
                                 f"gen_{gen:05d}.parquet")
            tmp = f"{tpath}.tmp.{uuid.uuid4().hex[:8]}"
            pq.write_table(pa.table({"doc_id": pa.array(tomb, pa.int64())}),
                           tmp)
            os.replace(tmp, tpath)
            entry["tombstones"] = os.path.relpath(tpath, self.root)
            entry["n_deleted"] = n_removed

        # -------- delta doc store + delta segments --------------------
        added_tokens = 0
        added_f = {f: 0 for f in tcols}
        n_new = len(self._creates) + len(self._preanalyzed)
        new_ndocs = m.num_docs - n_removed + n_new
        if self._creates or self._preanalyzed:
            parts = ([self._analyze_creates()] if self._creates else [])
            for r in self._preanalyzed:
                parts.append(r.select(parts[0].column_names)
                             if parts else r)
            an = pa.concat_tables(parts)
            added_tokens = int(np.sum(
                an["doc_len"].to_numpy(zero_copy_only=False)))
            if multi:
                for f in tcols:
                    added_f[f] = int(
                        an[f"dl__{f}"].to_numpy(zero_copy_only=False)
                        .astype(np.int64).sum())
            doc_dir = os.path.join(m.doc_table_dir(), f"delta_{gen:05d}")
            os.makedirs(doc_dir, exist_ok=True)
            fpath = os.path.join(doc_dir, f"an_{uuid.uuid4().hex[:12]}.parquet")
            pq.write_table(an, fpath, row_group_size=8192,
                           compression=self.cfg.analyzed_compression)
            entry["doc_dir"] = os.path.relpath(doc_dir, self.root)

            field_avgdl = None
            if multi:
                field_avgdl = {
                    f: ((s["total_tokens"] + added_f[f] - removed_f[f])
                        / new_ndocs if new_ndocs else 1.0)
                    for f, s in m.field_stats.items()}
            hot_salt = {t: v["n_salt"] for t, v in m.hot_terms.items()}
            enc = RunEncoder(num_segments=m.num_segments, hot_terms=hot_salt,
                             min_doc=m.min_doc, max_doc=m.max_doc)
            runs = enc(an)
            writer = SegmentWriter(
                self.root, self.cfg.k1, self.cfg.b,
                (m.total_tokens - removed_tokens + added_tokens)
                / new_ndocs if new_ndocs else 1.0,
                self.cfg.codec_block, name_prefix=entry["seg_prefix"],
                field_avgdl=field_avgdl,
                compression=self.cfg.segment_compression)
            skeys = runs["skey"].to_numpy(zero_copy_only=False)
            for s in np.unique(skeys):
                grp = runs.filter(pa.array(skeys == s))
                stats = writer(grp).to_pylist()[0]
                entry["segments"].append({k: int(stats[k]) for k in
                                          ("seg_id", "n_terms",
                                           "n_postings", "bytes")})
            # exact hot-term df bump from the delta slices
            if m.hot_terms:
                t_terms = runs["term"].to_pylist()
                t_docs = runs["docs"]
                for i, tname in enumerate(t_terms):
                    if tname in m.hot_terms:
                        m.hot_terms[tname]["df"] += len(t_docs[i])

        # -------- stats + manifest (the atomic commit point) ----------
        m.num_docs = m.num_docs - n_removed + n_new
        if multi:
            for f, s in m.field_stats.items():
                s["total_tokens"] = (s["total_tokens"] + added_f.get(f, 0)
                                     - removed_f.get(f, 0))
                s["avgdl"] = (s["total_tokens"] / m.num_docs) \
                    if m.num_docs else 1.0
        if getattr(m, "id_assignment", "explicit") == "dense":
            m.max_doc = max(m.max_doc, self._next_fresh - 1)
        m.total_tokens = m.total_tokens - removed_tokens + added_tokens
        m.avgdl = (m.total_tokens / m.num_docs) if m.num_docs else 1.0
        m.generation = gen
        m.deltas.append(entry)
        m.save()
        self._creates, self._preanalyzed, self._deletes = [], [], []
        return m

    def _new_avgdl(self, added: int, removed: int, n_removed: int) -> float:
        n = self.m.num_docs - n_removed + len(self._creates)
        tok = self.m.total_tokens - removed + added
        return (tok / n) if n else 1.0


# ---------------------------------------------------------------------------
# force_merge — fold deltas + tombstones into a clean gen-0 index
# ---------------------------------------------------------------------------

@ray.remote
def _merge_segment_task(seg_paths: list[tuple[str, int]], out_dir: str,
                        seg_id: int, tomb: list[tuple[int, np.ndarray]],
                        k1: float, b: float,
                        avgdl: float, block: int,
                        field_avgdl: dict | None = None,
                        compression: str = "lz4") -> dict | None:
    """Decode every (term,bucket) slice of one shard key across base +
    delta segment files, drop tombstoned docs, re-encode one clean
    segment (the per-segment merge actor of SURVEY.md §7.2 step 6).

    ``seg_paths`` carries (path, source_generation); a tombstone of
    generation g masks only postings from sources with generation < g —
    that is what resolves an update (tombstone at g + re-add at g) to
    the new version without dropping it."""
    from icat_lucene_ray.index.codec import concat_ranges, encode_u64_multi

    rows: dict[tuple[str, int], list[tuple]] = {}
    any_pos = False
    for path, src_gen in seg_paths:
        mask_parts = [ids for g, ids in tomb if g > src_gen]
        mask = (np.unique(np.concatenate(mask_parts))
                if mask_parts else np.empty(0, np.int64))
        t = pq.read_table(path)
        has_pos = "poss" in t.column_names
        any_pos = any_pos or has_pos
        for i in range(t.num_rows):
            key = (t["term"][i].as_py(), int(t["bucket"][i].as_py()))
            docs = np.cumsum(decode_u64_blocks(
                t["docs"][i].as_py(), block).astype(np.int64))
            tfs = decode_u64_blocks(t["tfs"][i].as_py(), block).astype(np.int64)
            dls = decode_u64_blocks(t["dls"][i].as_py(), block).astype(np.int64)
            poss = (decode_u64_blocks(t["poss"][i].as_py(), block)
                    .astype(np.int64) if has_pos else None)
            if len(mask):
                keep = np.flatnonzero(~np.isin(docs, mask))
                if poss is not None and len(keep) < len(docs):
                    pstart = np.zeros(len(tfs) + 1, dtype=np.int64)
                    np.cumsum(tfs, out=pstart[1:])
                    tot = int(tfs[keep].sum())
                    poss = poss[concat_ranges(pstart[:-1][keep], tfs[keep],
                                              np.empty(tot, np.int64))] \
                        if tot else np.empty(0, np.int64)
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if len(docs):
                rows.setdefault(key, []).append((docs, tfs, dls, poss))
    if not rows:
        return None
    keys = sorted(rows)
    doc_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
    starts, ends, pos_bounds = [], [], [0]
    pos = 0
    for key in keys:
        parts = rows[key]
        d = np.concatenate([p[0] for p in parts])
        tf = np.concatenate([p[1] for p in parts])
        dl = np.concatenate([p[2] for p in parts])
        order = np.argsort(d, kind="stable")
        doc_parts.append(d[order])
        tf_parts.append(tf[order])
        dl_parts.append(dl[order])
        if any_pos:
            pflat = np.concatenate(
                [p[3] if p[3] is not None else np.empty(0, np.int64)
                 for p in parts])
            pstart = np.zeros(len(tf) + 1, dtype=np.int64)
            np.cumsum(tf, out=pstart[1:])
            tot = int(tf.sum())
            pos_parts.append(pflat[concat_ranges(
                pstart[:-1][order], tf[order], np.empty(tot, np.int64))])
            pos_bounds.append(pos_bounds[-1] + tot)
        starts.append(pos)
        ends.append(pos + len(d))
        pos += len(d)
    avg = avgdl
    if field_avgdl:
        per_key = np.array(
            [field_avgdl.get(k[0].split(":", 1)[0], avgdl) for k in keys])
        avg = np.repeat(per_key, np.asarray(ends) - np.asarray(starts))
    enc = encode_postings_multi(
        np.concatenate(doc_parts), np.concatenate(tf_parts),
        np.concatenate(dl_parts), np.asarray(starts), np.asarray(ends),
        k1=k1, b=b, avgdl=avg, block=block)
    seg_cols = {
        "term": pa.array([k[0] for k in keys], pa.string()),
        "bucket": pa.array([k[1] for k in keys], pa.int32()),
        "df": pa.array(enc["df"], pa.int64()),
        "cf": pa.array(enc["cf"], pa.int64()),
        "docs": pa.array(enc["docs"], pa.binary()),
        "tfs": pa.array(enc["tfs"], pa.binary()),
        "dls": pa.array(enc["dls"], pa.binary()),
        "block_last": pa.array(enc["block_last"], pa.binary()),
        "block_max": pa.array(enc["block_max"], pa.binary()),
    }
    if any_pos:
        bounds = np.asarray(pos_bounds, dtype=np.int64)
        seg_cols["poss"] = pa.array(
            encode_u64_multi(np.concatenate(pos_parts), bounds[:-1],
                             bounds[1:], block), pa.binary())
    seg = pa.table(seg_cols).sort_by(
        [("term", "ascending"), ("bucket", "ascending")])
    path = os.path.join(out_dir, "segments", f"seg_{seg_id:05d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(seg, tmp, row_group_size=256, compression=compression)
    os.replace(tmp, path)
    n_post = int(np.sum([e - s for s, e in zip(starts, ends)]))
    return {"seg_id": seg_id, "n_terms": seg.num_rows,
            "n_postings": n_post, "bytes": os.path.getsize(path)}


def force_merge(root: str, out_root: str) -> IndexManifest:
    """Rewrite base + delta segments into a clean generation-0 index at
    ``out_root`` (tombstones applied, df exact again). Doc store rows
    are re-filtered per source generation. Parallel: one Ray task per
    shard key."""
    from icat_lucene_ray.query.engine import Index

    idx = Index(root)
    m = idx.manifest
    os.makedirs(os.path.join(out_root, "segments"), exist_ok=True)

    # (path, source_gen) per shard key
    seg_files: dict[int, list[tuple[str, int]]] = {}
    for s in m.segments:
        seg_files.setdefault(s["seg_id"], []).append(
            (m.segment_path(s["seg_id"]), 0))
    for d in m.deltas:
        for s in d["segments"]:
            seg_files.setdefault(s["seg_id"], []).append(
                (m.delta_segment_path(d["gen"], s["seg_id"]), d["gen"]))
    tcols = list(getattr(m, "text_fields", None) or [])
    multi = len(tcols) > 1
    live_cols = ["doc_id", "doc_len"] + \
        ([f"dl__{f}" for f in tcols] if multi else [])
    live_tbl = idx._doc_store_table(columns=live_cols)
    live_ids = np.sort(live_tbl["doc_id"].to_numpy(zero_copy_only=False))
    num_docs = len(live_ids)
    total_tokens = int(live_tbl["doc_len"].to_numpy(zero_copy_only=False).sum())
    avgdl = (total_tokens / num_docs) if num_docs else 1.0
    field_stats: dict[str, dict] = {}
    if multi:
        for f in tcols:
            tot = int(live_tbl[f"dl__{f}"].to_numpy(zero_copy_only=False)
                      .astype(np.int64).sum())
            field_stats[f] = {
                "total_tokens": tot,
                "avgdl": (tot / num_docs) if num_docs else 1.0}
    field_avgdl = {f: s["avgdl"] for f, s in field_stats.items()} or None

    refs = []
    for seg_id, paths in sorted(seg_files.items()):
        refs.append(_merge_segment_task.remote(
            paths, out_root, seg_id, idx._tomb, idx.cfg.k1, idx.cfg.b,
            avgdl, idx.cfg.codec_block, field_avgdl,
            idx.cfg.segment_compression))
    seg_stats = [r for r in ray.get(refs) if r is not None]

    # doc store: live rows only, one file per source file
    an_out = os.path.join(out_root, "analyzed", "shard_00000")
    os.makedirs(an_out, exist_ok=True)

    # live rows with explicit doc_id (the merged index always uses
    # explicit ids: dense bases cannot be preserved across deletions)
    doc_cols = [f.name for f in idx._doc_sources[0][1].schema]
    if "doc_id" not in doc_cols:
        doc_cols = ["doc_id"] + doc_cols
    live_all = idx._doc_store_table(columns=doc_cols)
    for s0 in range(0, live_all.num_rows, 65536):
        t = live_all.slice(s0, 65536)
        pq.write_table(
            t, os.path.join(an_out, f"an_{uuid.uuid4().hex[:12]}.parquet"),
            row_group_size=8192,
            compression=idx.cfg.analyzed_compression)

    # exact hot-term dfs from the merged segments (tombstones are gone,
    # so the pre-merge manifest values are stale)
    hot_terms: dict[str, dict] = {}
    if m.hot_terms:
        seg_ds = pads.dataset(os.path.join(out_root, "segments"))
        ht = seg_ds.to_table(
            columns=["term", "df"],
            filter=pads.field("term").isin(list(m.hot_terms)))
        sums: dict[str, int] = {}
        for t, dfv in zip(ht["term"].to_pylist(), ht["df"].to_pylist()):
            sums[t] = sums.get(t, 0) + int(dfv)
        hot_terms = {t: {"df": sums.get(t, 0), "n_salt": v["n_salt"]}
                     for t, v in m.hot_terms.items() if sums.get(t, 0) > 0}

    out = IndexManifest(
        root=out_root,
        analyzer=m.analyzer,
        analyzer_version=m.analyzer_version,
        config=m.config,
        num_docs=num_docs,
        avgdl=avgdl,
        total_tokens=total_tokens,
        # keep the ORIGINAL doc-id span: hot-term bucket boundaries in the
        # merged postings were computed against it, and future commits
        # must keep bucketing consistently
        min_doc=m.min_doc,
        max_doc=m.max_doc,
        num_segments=m.num_segments,
        hot_terms=hot_terms,
        segments=sorted(seg_stats, key=lambda r: r["seg_id"]),
        meta_cols=m.meta_cols,
        text_fields=tcols,
        field_stats=field_stats,
        termstats="segments",
        id_col=m.id_col,
        lineage={"merged_from": root, "generation": m.generation},
        metrics={},
    )
    out.save()
    return out


def clear_index(root: str) -> IndexManifest:
    """S6 ``clear`` (``Lucene.java:547-566``: deleteAll + commit): drop
    every document but keep the index open for new writes — segments,
    deltas, tombstones and doc store are removed; an empty doc-store
    file preserves the schema so readers and the updater keep working;
    the manifest resets to an empty generation (config/analyzer kept).
    """
    import shutil

    from icat_lucene_ray.query.engine import Index

    idx = Index(root)
    m = idx.manifest
    # full doc-store schema (before wiping; dense mode keeps doc_id
    # implicit, so the empty file's schema matches the old files')
    schema = idx._doc_sources[0][1].schema
    for sub in ("segments", "analyzed", "deletes", "facets"):
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
    an_dir = os.path.join(root, "analyzed", "shard_00000")
    os.makedirs(an_dir, exist_ok=True)
    empty_path = os.path.join(an_dir, "an_empty.parquet")
    pq.write_table(schema.empty_table(), empty_path)
    os.makedirs(os.path.join(root, "segments"), exist_ok=True)

    m.num_docs = 0
    m.total_tokens = 0
    m.avgdl = 1.0
    m.min_doc = 0
    m.max_doc = -1  # next dense create gets id 0
    m.hot_terms = {}
    m.segments = []
    m.deltas = []
    m.generation += 1
    m.id_files = ([[os.path.relpath(empty_path, root), 0]]
                  if getattr(m, "id_assignment", "explicit") == "dense"
                  else [])
    for s in getattr(m, "field_stats", {}).values():
        s["total_tokens"] = 0
        s["avgdl"] = 1.0
    m.save()
    return m
