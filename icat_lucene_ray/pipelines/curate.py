"""End-to-end web-corpus curation pipeline.

The "user switches their whole training-data pipeline to this engine"
surface: one call (or ``python -m icat_lucene_ray curate``) chains the
standard pre-training scrub over a documents table —

1. **scrub** — ONE fused stateless ``map_batches`` pass: PII redaction
   (typed tags, text replaced), quality metrics (token count /
   stop-word ratio / combined score), Gopher-style repetition metrics;
   threshold filters applied in the same pass so dropped rows never
   leave the task. Then the LangId actor-pool pass (+ optional
   language allowlist filter). Streaming write to
   ``{out}/scrubbed/``.
2. **dedup** — exact content dedup as ONE hash shuffle carrying full
   rows, BUCKETED: rows group by ``hash(fp_md5) % dedup_buckets`` and
   each vectorized group call keeps the lowest id per fp run (one
   Python call per bucket, not per content group — at web scale
   nearly every group has size 1, so per-group calls would be O(rows)
   Python overhead; no driver id sets either way), then
   MinHash+LSH near-dup (cluster-side pair verify + connected
   components; small drop sets broadcast as an anti-filter, large ones
   stay a Dataset and anti-join distributed — the drop ids never
   transit the driver at web-scale dup rates).
   Streaming write to ``{out}/deduped/``.
3. **decontam** — benchmark n-gram overlap scrub (broadcast shingle
   set, shuffle-free membership filter). Streaming write to
   ``{out}/curated/``.

Every stage writes partitioned parquet and a ``_DONE.json`` marker;
re-running skips finished stages (resumable at stage granularity —
at 100 TB you resume a failed run without redoing the scrub shuffle).
Per-stage row counts come from parquet METADATA (``count_rows()``),
never a data scan.

The reference engine has no curation pipeline (it indexes ICAT
metadata); this is the brief's training-data surface composed from the
engine's own ops.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
import ray.data


@dataclass
class CurateConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    #: scrub thresholds (None disables a rule)
    min_tokens: int | None = 3
    max_stop_ratio: float | None = 0.9
    min_quality: float | None = None
    max_dup_word_frac: float | None = 0.9
    max_top_bigram_frac: float | None = 0.9
    redact_pii: bool = True
    #: language allowlist on the PREDICTED language (None keeps all)
    langs: tuple[str, ...] | None = None
    #: near-dup off when None
    near_dup_threshold: float | None = 0.8
    #: MinHash signature kernel: "auto" (default — length-stratified:
    #: one-permutation speed on long docs, classic perm estimator on
    #: short docs, double-signed boundary so no qualifying pair is
    #: missed), "perm", or "oph" (see ops.dedup.MinHasher)
    minhash_scheme: str = "auto"
    #: decontamination (no-op when the pipeline gets no benchmark)
    decontam_n: int = 5
    decontam_min_hits: int = 1
    #: exact-dedup shuffle buckets: rows group by hash(fp_md5) % B, so
    #: ~rows/B land in each vectorized keep-min group call — size B so
    #: a bucket (rows x row bytes / B) fits a worker's heap
    dedup_buckets: int = 256
    #: columns dropped AT THE READ (never leave storage) — e.g. raw
    #: html when only the extracted text is curated; pruning here keeps
    #: the dedup shuffle and every checkpoint payload-free
    drop_cols: tuple[str, ...] = ()


def _count_rows(path: str) -> int:
    return pads.dataset(path, format="parquet").count_rows()


def _done(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_DONE.json"))


def _mark_done(stage_dir: str, info: dict) -> None:
    with open(os.path.join(stage_dir, "_DONE.json"), "w") as f:
        json.dump(info, f)


def _scrub_stage(cfg: CurateConfig):
    """Fused scrub: redact + metrics + threshold filter, one pass."""
    from icat_lucene_ray.ops.text import (
        add_quality_score, add_repetition_metrics, redact_pii)

    def _scrub(batch: pa.Table) -> pa.Table:
        if cfg.redact_pii:
            batch = redact_pii(batch, cfg.text_col)
            i = batch.schema.get_field_index(cfg.text_col)
            batch = batch.set_column(i, cfg.text_col,
                                     batch["clean_text"]) \
                         .drop_columns(["clean_text"])
        batch = add_quality_score(batch, cfg.text_col)
        batch = add_repetition_metrics(batch, cfg.text_col)
        keep = pa.array([True] * batch.num_rows)
        if cfg.min_tokens is not None:
            keep = pc.and_(keep, pc.greater_equal(
                batch["n_tokens"], cfg.min_tokens))
        if cfg.max_stop_ratio is not None:
            keep = pc.and_(keep, pc.less_equal(
                batch["stop_ratio"], cfg.max_stop_ratio))
        if cfg.min_quality is not None:
            keep = pc.and_(keep, pc.greater_equal(
                batch["quality"], cfg.min_quality))
        if cfg.max_dup_word_frac is not None:
            keep = pc.and_(keep, pc.less_equal(
                batch["dup_word_frac"], cfg.max_dup_word_frac))
        if cfg.max_top_bigram_frac is not None:
            keep = pc.and_(keep, pc.less_equal(
                batch["top_bigram_frac"], cfg.max_top_bigram_frac))
        return batch.filter(keep)

    return _scrub


def _clear_stage(stage_dir: str) -> None:
    """A stage directory without ``_DONE.json`` is a mid-write crash
    leftover: Ray's ``write_parquet`` appends files under fresh per-run
    uuids, so re-running into the same directory would leave the stale
    partial files alongside the new full copy and every downstream
    ``count_rows``/read would see duplicated rows. Clear it first —
    stage writes are atomic at the granularity of the ``_DONE.json``
    marker, never of individual parquet files."""
    import shutil

    if os.path.isdir(stage_dir) and not _done(stage_dir):
        shutil.rmtree(stage_dir)


def scrub_transform(ds: "ray.data.Dataset", cfg: CurateConfig
                    ) -> "ray.data.Dataset":
    """Stage 1 as a lazy transform: fused redact+metrics+filter pass,
    LangId actor pass, optional language allowlist."""
    from icat_lucene_ray.ops.text import LangId

    ds = ds.map_batches(_scrub_stage(cfg), batch_format="pyarrow")
    # autoscaling actor pool: marker tables build once per actor; the
    # pool grows to keep up with the stateless scrub stage upstream
    ds = ds.map_batches(LangId, batch_format="pyarrow",
                        fn_constructor_kwargs={"col": cfg.text_col},
                        concurrency=(2, 8))
    if cfg.langs is not None:
        allowed = pa.array(list(cfg.langs), pa.string())
        ds = ds.map_batches(
            lambda b: b.filter(pc.is_in(b["lang_pred"], value_set=allowed)),
            batch_format="pyarrow")
    return ds


def dedup_transform(ds: "ray.data.Dataset", cfg: CurateConfig, *,
                    left_rows: int | None = None,
                    driver_cap: int = 200_000) -> "ray.data.Dataset":
    """Stage 2 as a lazy transform: exact content dedup + optional
    MinHash near-dup anti-filter.

    The exact pass shuffles ONLY (fp_md5, id) pairs. The corpus payload
    must never enter an all-to-all exchange: parquet text decompresses
    ~5-10× into plasma, so a full-row sort shuffle of a 12M-page corpus
    spilled >190 GB and filled the disk at the sf1 dress rehearsal.
    The pair shuffle is O(rows × ~60 B); the resulting drop set then
    anti-filters the corpus in a second streaming pass — broadcast
    below ``driver_cap`` drops (same 200k budget as the near-dup CC
    driver cap), bucketed :func:`anti_join_ids_ds` above it (pass
    ``left_rows`` so the join buckets the LEFT side finely enough)."""
    from icat_lucene_ray.ops.dedup import (
        add_fp_bucket, anti_join_ids_ds, drop_non_min_per_fp,
        filter_out_ids, minhash_lsh_dedup)
    from icat_lucene_ray.ops.text import add_md5_fingerprint

    B = cfg.dedup_buckets
    # string-keyed corpora (CC-style url keys — the flagship input
    # schema) get stable 63-bit hash ids ONCE, up front: the exact
    # anti-filter and the near-dup machinery both key on int64,
    # exactly like the index build's doc ids
    nd_id = cfg.id_col
    id_type = ds.schema().base_schema.field(cfg.id_col).type
    if not pa.types.is_integer(id_type):
        from icat_lucene_ray.index.docids import hash_ids_from_strings

        nd_id = "_nid64"

        def _add_nid(b: pa.Table) -> pa.Table:
            return b.append_column(nd_id, pa.array(
                hash_ids_from_strings(b[cfg.id_col]), pa.int64()))

        ds = ds.map_batches(_add_nid, batch_format="pyarrow")

    pair_cols = [cfg.id_col] + ([nd_id] if nd_id != cfg.id_col else [])
    pairs = ds.map_batches(
        lambda b: add_fp_bucket(
            add_md5_fingerprint(b, cfg.text_col)
            .select(["fp_md5"] + pair_cols), B),
        batch_format="pyarrow")
    # keep = lowest cfg.id_col per fp (the SQL-oracle rule); the group
    # call emits only the DROPPED rows' int64 ids
    drops = pairs.groupby("_dbkt").map_groups(
        drop_non_min_per_fp, batch_format="pyarrow",
        fn_args=(cfg.id_col, nd_id)).materialize()
    n_drop = drops.count()
    if n_drop == 0:
        exact = ds
    elif n_drop <= driver_cap:  # small set: broadcast anti-filter
        exact = filter_out_ids(
            ds, drops.to_pandas()[nd_id].to_numpy(), nd_id)
    else:  # web-scale drop set: distributed anti-join
        exact = anti_join_ids_ds(ds, drops, id_col=nd_id,
                                 left_rows=left_rows)
    if cfg.near_dup_threshold is not None:
        res = minhash_lsh_dedup(
            exact, threshold=cfg.near_dup_threshold,
            text_col=cfg.text_col, id_col=nd_id,
            scheme=cfg.minhash_scheme)
        if res["drop"] is not None:  # small set: broadcast anti-filter
            exact = filter_out_ids(exact, res["drop"], nd_id)
        elif res["n_drop"]:  # web-scale drop set: distributed anti-join
            exact = anti_join_ids_ds(exact, res["drop_ds"], id_col=nd_id,
                                     left_rows=left_rows)
    if nd_id != cfg.id_col:
        exact = exact.map_batches(
            lambda b: b.drop_columns([nd_id]), batch_format="pyarrow")
    return exact


def decontam_transform(ds: "ray.data.Dataset",
                       bench: "ray.data.Dataset | list[str] | None",
                       cfg: CurateConfig) -> "ray.data.Dataset":
    """Stage 3 as a lazy transform: benchmark n-gram anti-filter
    (no-op when ``bench`` is None)."""
    from icat_lucene_ray.ops.decontam import decontaminate

    if bench is None:
        return ds
    return decontaminate(ds, bench, n=cfg.decontam_n,
                         text_col=cfg.text_col, id_col=cfg.id_col,
                         min_hits=cfg.decontam_min_hits)


def curate(src: str, out_dir: str, *,
           bench: "str | list[str] | None" = None,
           cfg: CurateConfig | None = None) -> dict:
    """Run the full pipeline ``src`` (parquet path/dir) → ``out_dir``.
    ``bench``: parquet path (text column) or list of benchmark texts;
    None skips decontamination. Returns the report dict (also written
    to ``{out_dir}/report.json``)."""
    cfg = cfg or CurateConfig()
    os.makedirs(out_dir, exist_ok=True)
    scrubbed = os.path.join(out_dir, "scrubbed")
    deduped = os.path.join(out_dir, "deduped")
    curated = os.path.join(out_dir, "curated")
    report: dict = {"input_rows": _count_rows(src), "stages": {}}

    # ---- stage 1: scrub ---------------------------------------------
    t0 = time.perf_counter()
    if not _done(scrubbed):
        _clear_stage(scrubbed)
        cols = None
        if cfg.drop_cols:
            names = pads.dataset(src, format="parquet").schema.names
            cols = [c for c in names if c not in cfg.drop_cols]
        scrub_transform(ray.data.read_parquet(src, columns=cols), cfg) \
            .write_parquet(scrubbed)
        _mark_done(scrubbed, {"sec": round(time.perf_counter() - t0, 3)})
    report["stages"]["scrub"] = {
        "rows": _count_rows(scrubbed),
        **json.load(open(os.path.join(scrubbed, "_DONE.json")))}

    # ---- stage 2: dedup ---------------------------------------------
    t0 = time.perf_counter()
    if not _done(deduped):
        _clear_stage(deduped)
        dedup_transform(ray.data.read_parquet(scrubbed), cfg,
                        left_rows=report["stages"]["scrub"]["rows"]) \
            .write_parquet(deduped)
        _mark_done(deduped, {"sec": round(time.perf_counter() - t0, 3)})
    report["stages"]["dedup"] = {
        "rows": _count_rows(deduped),
        **json.load(open(os.path.join(deduped, "_DONE.json")))}

    # ---- stage 3: decontaminate -------------------------------------
    t0 = time.perf_counter()
    if not _done(curated):
        _clear_stage(curated)
        bench_in: "ray.data.Dataset | list[str] | None"
        if isinstance(bench, str):
            bench_in = ray.data.read_parquet(bench)
        elif bench is not None:
            bench_in = list(bench)
        else:
            bench_in = None
        decontam_transform(ray.data.read_parquet(deduped), bench_in, cfg) \
            .write_parquet(curated)
        _mark_done(curated, {"sec": round(time.perf_counter() - t0, 3)})
    report["stages"]["decontam"] = {
        "rows": _count_rows(curated),
        **json.load(open(os.path.join(curated, "_DONE.json")))}

    report["curated_rows"] = report["stages"]["decontam"]["rows"]
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report
