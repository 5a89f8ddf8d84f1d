"""Posting-list codec: delta + per-block bit packing (FOR / PForDelta-lite)
with block-max metadata.

Equivalent role to Lucene's postings format behind ``TextField``
(``Field.java:59-60`` → Lucene84 codec): sorted docIDs stored as deltas,
packed to the per-block minimum bit width, plus per-block skip data
(last docID) and block-max scoring metadata (max normalized-tf
contribution) enabling WAND-style block skipping at query time.

Layout of one encoded stream (``encode_u64_blocks``)::

    [u32 n_values][u8 width * n_blocks][packed payload blocks ...]

Block size is ``EngineConfig.codec_block`` (default 128, as in Lucene).
Payload offsets are implied by the width array (``cumsum`` of per-block
byte sizes), so individual blocks are randomly addressable — decode can
skip blocks (see ``decode_u64_blocks(block_mask=...)``).

Everything is numpy-vectorized *across blocks*: blocks are grouped by
bit width and each width class is packed/unpacked in one
``np.packbits`` / ``np.unpackbits`` call, so per-call Python overhead is
O(#distinct widths) ≤ 64, not O(#blocks).
"""

from __future__ import annotations

import numpy as np

_HEADER = 4  # u32 value count

# ---------------------------------------------------------------------------
# scratch-buffer pool
#
# The encoder's temporaries are tens-to-hundreds of MB; with 32 workers
# allocating/freeing them per task, glibc mmap/munmap churn puts the
# machine into a kernel page-fault + TLB-shootdown storm (observed: >90%
# system time, 13× slowdown vs solo). Buffers here are allocated once
# per worker process and reused — faults happen on first touch only.
# Resident cost per worker ≈ the largest segment's working set.
# ---------------------------------------------------------------------------

_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    """A reusable uninitialized array of ``n`` items of ``dtype``."""
    dt = np.dtype(dtype)
    nbytes = n * dt.itemsize
    buf = _SCRATCH.get(name)
    if buf is None or buf.nbytes < nbytes:
        buf = _SCRATCH[name] = np.empty(int(nbytes * 1.25) + 64, np.uint8)
    return buf[:nbytes].view(dt)


def clear_scratch() -> None:
    _SCRATCH.clear()


def concat_ranges(starts: np.ndarray, lens: np.ndarray,
                  out: np.ndarray) -> np.ndarray:
    """out[:] = concatenate([arange(s, s+l) for s, l in zip(starts, lens)])
    in one cumsum pass (no np.repeat / np.arange temporaries).
    Precondition: every ``lens`` entry > 0."""
    total = out.shape[0]
    if total == 0:
        return out
    out[:] = 1
    out[0] = starts[0]
    # at each range boundary, jump from (prev_start + prev_len - 1) to start
    bpos = np.cumsum(lens)[:-1]
    out[bpos] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    np.cumsum(out, out=out)
    return out


def repeat_ids(lens: np.ndarray, out: np.ndarray) -> np.ndarray:
    """out[:] = np.repeat(arange(len(lens)), lens) without temporaries.
    Precondition: every ``lens`` entry > 0."""
    total = out.shape[0]
    if total == 0:
        return out
    out[:] = 0
    bpos = np.cumsum(lens)[:-1]
    out[bpos] = 1
    np.cumsum(out, out=out)
    return out


def _bit_widths(block_max: np.ndarray) -> np.ndarray:
    """Per-block bit width: smallest w with max < 2**w (0 for all-zero)."""
    m = block_max.astype(np.uint64, copy=False)
    w = np.zeros(len(m), dtype=np.uint8)
    for k in range(64):
        w += (m >= np.uint64(1) << np.uint64(k)).astype(np.uint8)
    return w


def _storage_widths(w: np.ndarray) -> np.ndarray:
    """Round widths >4 up to byte-aligned classes {8, 16, 32, 64}.

    Bit-packing traffic is one BYTE per BIT (unpackbits), so wide blocks
    (e.g. ~45-bit deltas of hashed doc ids) cost ~6× more memory traffic
    than a plain memcpy while saving <30% space. Byte-aligned classes
    store raw little-endian uintN — byte-identical to what packbits
    would produce at w=N, so the format stays self-consistent and any
    decoder that handles generic widths remains correct. Only w ≤ 4
    keeps true bit packing (≥2× space win, negligible traffic)."""
    out = w.copy()
    out[(w > 4) & (w <= 8)] = 8
    out[(w > 8) & (w <= 16)] = 16
    out[(w > 16) & (w <= 32)] = 32
    out[w > 32] = 64
    return out.astype(np.uint8)


def encode_u64_blocks(values: np.ndarray, block: int = 128) -> bytes:
    """Bit-pack ``values`` (non-negative, any dtype castable to uint64)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    out_parts: list[bytes] = [np.uint32(n).tobytes()]
    if n == 0:
        return b"".join(out_parts)
    nblocks = -(-n // block)
    padded = np.zeros(nblocks * block, dtype=np.uint64)
    padded[:n] = vals
    v2d = padded.reshape(nblocks, block)
    widths = _storage_widths(_bit_widths(v2d.max(axis=1)))
    out_parts.append(widths.tobytes())

    byte_lens = (widths.astype(np.int64) * block + 7) // 8
    offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=offsets[1:])
    payload = np.zeros(int(offsets[-1]), dtype=np.uint8)

    for w in np.unique(widths):
        if w == 0:
            continue
        w = int(w)
        idx = np.nonzero(widths == w)[0]
        k = len(idx)
        blen = (block * w + 7) // 8
        if w == 64:
            packed = np.ascontiguousarray(v2d[idx]).view(np.uint8) \
                .reshape(k, blen)
        elif w in (8, 16, 32):
            dt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[w]
            packed = v2d[idx].astype(dt).view(np.uint8).reshape(k, blen)
        else:
            nbytes_in = (w + 7) // 8
            # little-endian byte view -> keep only the w meaningful bits
            b8 = np.ascontiguousarray(v2d[idx]).view(np.uint8).reshape(k, block, 8)
            bits = np.unpackbits(
                np.ascontiguousarray(b8[:, :, :nbytes_in]), axis=2,
                bitorder="little")[:, :, :w]
            packed = np.packbits(bits.reshape(k, block * w), axis=-1,
                                 bitorder="little")
        dest = offsets[idx][:, None] + np.arange(blen)
        payload[dest] = packed
    out_parts.append(payload.tobytes())
    return b"".join(out_parts)


def decode_u64_blocks(
    buf: bytes | memoryview | np.ndarray,
    block: int = 128,
    block_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Inverse of :func:`encode_u64_blocks`.

    ``block_mask`` (bool array over blocks) decodes only selected blocks;
    unselected blocks come back as zeros. The returned array always has
    the full value count (callers slice by block themselves).
    """
    raw = np.frombuffer(buf, dtype=np.uint8)
    n = int(np.frombuffer(raw[:_HEADER], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nblocks = -(-n // block)
    widths = raw[_HEADER:_HEADER + nblocks]
    byte_lens = (widths.astype(np.int64) * block + 7) // 8
    offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=offsets[1:])
    payload = raw[_HEADER + nblocks:]

    out = np.zeros(nblocks * block, dtype=np.uint64)
    o2d = out.reshape(nblocks, block)
    select = np.ones(nblocks, dtype=bool) if block_mask is None else block_mask
    for w in np.unique(widths):
        if w == 0:
            continue
        w = int(w)
        idx = np.nonzero((widths == w) & select)[0]
        k = len(idx)
        if k == 0:
            continue
        blen = (block * w + 7) // 8
        src = payload[offsets[idx][:, None] + np.arange(blen)]
        if w in (8, 16, 32, 64):
            # byte-aligned class: plain little-endian widen (memcpy-speed)
            dt = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[w]
            o2d[idx] = np.ascontiguousarray(src).view(dt) \
                .astype(np.uint64).reshape(k, block)
            continue
        bits = np.unpackbits(src, axis=-1, bitorder="little")[:, : block * w]
        bits = bits.reshape(k, block, w)
        nbytes_out = (w + 7) // 8
        by = np.zeros((k, block, 8), dtype=np.uint8)
        by[:, :, :nbytes_out] = np.packbits(
            np.ascontiguousarray(bits), axis=2, bitorder="little"
        )[:, :, :nbytes_out]
        o2d[idx] = by.reshape(k, block * 8).view(np.uint64)
    return out[:n]


# ---------------------------------------------------------------------------
# Posting-list level API
# ---------------------------------------------------------------------------

def tf_norm(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 idf-independent per-posting factor (SURVEY.md §7.0; Lucene 8
    BM25Similarity semantics with exact doc lengths)."""
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block: int = 128,
) -> dict:
    """Encode one term's postings (sorted unique int64 docIDs).

    Returns binary streams + block-max metadata:
      ``docs`` delta-packed docIDs, ``tfs``/``dls`` packed values,
      ``block_last`` u64 last-docID per block (skip data),
      ``block_max`` f32 max tf_norm per block (WAND upper bound).
    """
    n = len(doc_ids)
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = np.uint64(ids[0])
        np.subtract(ids[1:], ids[:-1], out=deltas[1:], casting="unsafe")
    nblocks = -(-n // block) if n else 0
    pad = nblocks * block - n
    ids_pad = np.concatenate([ids, np.full(pad, ids[-1] if n else 0, dtype=np.int64)])
    block_last = ids_pad.reshape(nblocks, block)[:, -1].astype(np.uint64) if n else np.empty(0, np.uint64)
    tfn = tf_norm(np.asarray(tfs), np.asarray(dls), k1, b, avgdl)
    tfn_pad = np.concatenate([tfn, np.zeros(pad)]) if n else tfn
    block_max = (
        tfn_pad.reshape(nblocks, block).max(axis=1).astype(np.float32)
        if n else np.empty(0, np.float32)
    )
    return {
        "docs": encode_u64_blocks(deltas, block),
        "tfs": encode_u64_blocks(np.asarray(tfs), block),
        "dls": encode_u64_blocks(np.asarray(dls), block),
        "block_last": block_last.tobytes(),
        "block_max": block_max.tobytes(),
        "df": n,
        "cf": int(np.asarray(tfs, dtype=np.int64).sum()) if n else 0,
    }


def _pack_all_blocks(padded: np.ndarray, nblocks: int, block: int,
                     scratch_name: str = ""):
    """Bit-pack a (nblocks*block,) padded value array in one vectorized
    pass; returns (widths uint8[nblocks], payload bytes, byte_lens)."""
    v2d = padded.reshape(nblocks, block)
    widths = _storage_widths(_bit_widths(v2d.max(axis=1)))
    byte_lens = (widths.astype(np.int64) * block + 7) // 8
    offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=offsets[1:])
    nbytes = int(offsets[-1])
    # every payload byte belongs to exactly one nonzero-width block and is
    # fully written below (zero-width blocks occupy no bytes), so the
    # buffer needs no zeroing and is safe to reuse across calls
    payload = (_scratch(f"pay_{scratch_name}", nbytes, np.uint8)
               if scratch_name else np.empty(nbytes, dtype=np.uint8))
    for w in np.unique(widths):
        if w == 0:
            continue
        w = int(w)
        idx = np.nonzero(widths == w)[0]
        k = len(idx)
        blen = (block * w + 7) // 8
        if w == 64:
            if k == nblocks:  # common case: one class, contiguous memcpy
                payload[:] = v2d.reshape(-1).view(np.uint8)[:nbytes]
                continue
            take = _scratch("take64", k * block, np.uint64).reshape(k, block)
            np.take(v2d, idx, axis=0, out=take)
            packed = take.view(np.uint8).reshape(k, blen)
        elif w in (8, 16, 32):
            take = _scratch("take64", k * block, np.uint64).reshape(k, block)
            np.take(v2d, idx, axis=0, out=take)
            dt = {8: np.uint8, 16: np.uint16, 32: np.uint32}[w]
            tN = _scratch("takeN", k * block, dt).reshape(k, block)
            tN[:] = take
            packed = tN.view(np.uint8).reshape(k, blen)
        else:
            nbytes_in = (w + 7) // 8
            take = _scratch("take64", k * block, np.uint64).reshape(k, block)
            np.take(v2d, idx, axis=0, out=take)
            b8 = take.view(np.uint8).reshape(k, block, 8)
            bits = np.unpackbits(
                np.ascontiguousarray(b8[:, :, :nbytes_in]), axis=2,
                bitorder="little")[:, :, :w]
            packed = np.packbits(bits.reshape(k, block * w), axis=-1,
                                 bitorder="little")
        dest = offsets[idx][:, None] + np.arange(blen)
        payload[dest] = packed
    return widths, payload, byte_lens, offsets


def encode_postings_multi(
    doc_s: np.ndarray,
    tf_s: np.ndarray,
    dl_s: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    *,
    k1: float,
    b: float,
    avgdl: float,
    block: int = 128,
) -> dict:
    """Encode MANY terms' postings at once (one segment's worth).

    ``doc_s/tf_s/dl_s`` are the segment's postings sorted by
    (term, doc); ``starts[i]:ends[i]`` delimits term i. All bit packing
    runs in a single pass over the union of every term's blocks — per
    term Python cost is just buffer slicing. Per-term streams are
    byte-identical to :func:`encode_postings` output.

    Returns dict of lists: docs, tfs, dls, block_last, block_max
    (bytes per term) + df, cf (ints per term).
    """
    n_terms = len(starts)
    lens = (ends - starts).astype(np.int64)
    N = len(doc_s)
    doc_s = np.ascontiguousarray(doc_s, dtype=np.int64)

    # per-term delta chains, vectorized with resets at term starts
    deltas = _scratch("deltas", N, np.uint64)
    if N:
        np.subtract(doc_s[1:], doc_s[:-1], out=deltas[1:], casting="unsafe")
        deltas[starts] = doc_s[starts].astype(np.uint64)

    nblocks_t = -(-lens // block)
    blk_off = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(nblocks_t, out=blk_off[1:])
    total_blocks = int(blk_off[-1])

    # positions of real values inside the padded (total_blocks * block)
    # layout; the pad slots keep whatever zeros the fill below writes
    gpos = concat_ranges(blk_off[:-1] * block, lens,
                         _scratch("gpos", N, np.int64))
    padded = _scratch("padded", total_blocks * block, np.uint64)

    def pack(vals: np.ndarray, name: str):
        padded[:] = 0
        padded[gpos] = vals
        return _pack_all_blocks(padded, total_blocks, block, scratch_name=name)

    w_d, p_d, bl_d, off_d = pack(deltas, "d")
    w_t, p_t, bl_t, off_t = pack(tf_s.astype(np.uint64, copy=False), "t")
    w_l, p_l, bl_l, off_l = pack(dl_s.astype(np.uint64, copy=False), "l")

    # block metadata (real values only, no padding artifacts)
    btid = repeat_ids(nblocks_t, _scratch("btid", total_blocks, np.int64))
    b_local = concat_ranges(np.zeros(n_terms, np.int64), nblocks_t,
                            _scratch("blocal", total_blocks, np.int64))
    last_idx = starts[btid] + np.minimum((b_local + 1) * block, lens[btid]) - 1
    block_last_all = doc_s[last_idx].astype(np.uint64)
    tfn = tf_norm(tf_s, dl_s, k1, b, avgdl)
    # per-block max via reduceat over block start positions (every block
    # is non-empty, so the index vector is strictly increasing)
    blk_starts = starts[btid] + b_local * block
    block_max_all = (np.maximum.reduceat(tfn, blk_starts)
                     if N else np.zeros(0)).astype(np.float32)

    # per-term totals (postings are term-contiguous -> reduceat)
    cf_all = (np.add.reduceat(tf_s.astype(np.int64, copy=False), starts)
              if N else np.zeros(0, np.int64))

    out = {"docs": [], "tfs": [], "dls": [], "block_last": [],
           "block_max": [], "df": lens.tolist(), "cf": cf_all.tolist()}
    w_d_b, w_t_b, w_l_b = w_d.tobytes(), w_t.tobytes(), w_l.tobytes()
    bl_bytes = block_last_all.tobytes()
    bm_bytes = block_max_all.tobytes()
    for i in range(n_terms):
        b0, b1 = int(blk_off[i]), int(blk_off[i + 1])
        hdr = np.uint32(lens[i]).tobytes()
        out["docs"].append(hdr + w_d_b[b0:b1]
                           + p_d[int(off_d[b0]):int(off_d[b1])].tobytes())
        out["tfs"].append(hdr + w_t_b[b0:b1]
                          + p_t[int(off_t[b0]):int(off_t[b1])].tobytes())
        out["dls"].append(hdr + w_l_b[b0:b1]
                          + p_l[int(off_l[b0]):int(off_l[b1])].tobytes())
        out["block_last"].append(bl_bytes[b0 * 8:b1 * 8])
        out["block_max"].append(bm_bytes[b0 * 4:b1 * 4])
    return out


def encode_u64_multi(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                     block: int = 128) -> list[bytes]:
    """Encode MANY value slices at once — one vectorized packing pass
    across the union of every slice's blocks; per-slice output bytes are
    identical to :func:`encode_u64_blocks` of that slice. Used for the
    positional streams (one slice per term). Precondition: every slice
    is non-empty."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n_terms = len(starts)
    lens = ends - starts
    nblocks_t = -(-lens // block)
    blk_off = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(nblocks_t, out=blk_off[1:])
    total_blocks = int(blk_off[-1])
    N = int(lens.sum())
    gpos = concat_ranges(blk_off[:-1] * block, lens, np.empty(N, np.int64))
    padded = np.zeros(total_blocks * block, dtype=np.uint64)
    padded[gpos] = np.ascontiguousarray(vals, dtype=np.uint64)[
        concat_ranges(starts, lens, np.empty(N, np.int64))]
    widths, payload, _bl, offsets = _pack_all_blocks(
        padded, total_blocks, block)
    w_b = widths.tobytes()
    out: list[bytes] = []
    for i in range(n_terms):
        b0, b1 = int(blk_off[i]), int(blk_off[i + 1])
        out.append(np.uint32(lens[i]).tobytes() + w_b[b0:b1]
                   + payload[int(offsets[b0]):int(offsets[b1])].tobytes())
    return out


def decode_postings(
    row: dict,
    block: int = 128,
    block_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs, dls). With ``block_mask``, only selected
    blocks carry meaningful values — callers must mask rows by block
    (docID delta chains restart correctness is preserved because deltas
    are decoded fully; masking only skips unpacking work for tf/dl)."""
    deltas = decode_u64_blocks(row["docs"], block)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = decode_u64_blocks(row["tfs"], block, block_mask).astype(np.int64)
    dls = decode_u64_blocks(row["dls"], block, block_mask).astype(np.int64)
    return doc_ids, tfs, dls
