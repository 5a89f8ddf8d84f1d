"""Posting codec round-trips — FIXTURES.md §4: random df/tf/gap
distributions, block-boundary sizes, block-max equals true per-block max."""

import numpy as np
import pytest

from icat_lucene_ray.index.codec import (
    decode_postings,
    decode_u64_blocks,
    encode_postings,
    encode_u64_blocks,
    tf_norm,
)


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 255, 256, 257, 5000])
@pytest.mark.parametrize("hi_bits", [1, 7, 31, 40, 63])
def test_u64_roundtrip(n, hi_bits):
    rng = np.random.default_rng(n * 64 + hi_bits)
    v = rng.integers(0, 1 << hi_bits, size=n).astype(np.uint64)
    assert np.array_equal(decode_u64_blocks(encode_u64_blocks(v)), v)


def test_u64_all_zero_and_max():
    v = np.zeros(300, dtype=np.uint64)
    assert np.array_equal(decode_u64_blocks(encode_u64_blocks(v)), v)
    v = np.full(130, (1 << 63) - 1, dtype=np.uint64)
    assert np.array_equal(decode_u64_blocks(encode_u64_blocks(v)), v)


def test_partial_block_decode():
    rng = np.random.default_rng(9)
    v = rng.integers(0, 1 << 20, size=1000).astype(np.uint64)
    buf = encode_u64_blocks(v)
    mask = np.zeros(-(-1000 // 128), dtype=bool)
    mask[[1, 3]] = True
    out = decode_u64_blocks(buf, block_mask=mask)
    sel = np.repeat(mask, 128)[:1000]
    assert np.array_equal(out[sel], v[sel])


@pytest.mark.parametrize("n", [1, 127, 128, 129, 10_000])
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n)
    ids = np.sort(rng.choice(1 << 45, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 60, n)
    dls = rng.integers(20, 2000, n)
    enc = encode_postings(ids, tfs, dls, k1=1.2, b=0.75, avgdl=250.0)
    d_ids, d_tfs, d_dls = decode_postings(enc)
    assert np.array_equal(ids, d_ids)
    assert np.array_equal(tfs, d_tfs)
    assert np.array_equal(dls, d_dls)
    assert enc["df"] == n
    assert enc["cf"] == int(tfs.sum())


def test_block_metadata():
    rng = np.random.default_rng(3)
    n = 1000
    ids = np.sort(rng.choice(1 << 30, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 60, n)
    dls = rng.integers(20, 2000, n)
    enc = encode_postings(ids, tfs, dls, k1=1.2, b=0.75, avgdl=250.0)
    block_last = np.frombuffer(enc["block_last"], np.uint64)
    block_max = np.frombuffer(enc["block_max"], np.float32)
    nb = -(-n // 128)
    assert len(block_last) == len(block_max) == nb
    for i in range(nb):
        s, e = i * 128, min(n, (i + 1) * 128)
        assert block_last[i] == ids[e - 1]
        true_max = tf_norm(tfs[s:e], dls[s:e], 1.2, 0.75, 250.0).max()
        assert abs(block_max[i] - true_max) < 1e-6


def test_multi_encode_byte_identical():
    """encode_postings_multi output per term == encode_postings output."""
    from icat_lucene_ray.index.codec import encode_postings_multi

    rng = np.random.default_rng(11)
    # several terms with varied dfs incl. block-boundary sizes
    dfs = [1, 5, 127, 128, 129, 300, 1000]
    doc_parts, tf_parts, dl_parts, starts, ends = [], [], [], [], []
    pos = 0
    for df in dfs:
        ids = np.sort(rng.choice(1 << 45, size=df, replace=False)).astype(np.int64)
        doc_parts.append(ids)
        tf_parts.append(rng.integers(1, 60, df))
        dl_parts.append(rng.integers(20, 2000, df))
        starts.append(pos)
        ends.append(pos + df)
        pos += df
    doc_s = np.concatenate(doc_parts)
    tf_s = np.concatenate(tf_parts)
    dl_s = np.concatenate(dl_parts)
    multi = encode_postings_multi(
        doc_s, tf_s, dl_s, np.array(starts), np.array(ends),
        k1=1.2, b=0.75, avgdl=250.0)
    for i, df in enumerate(dfs):
        single = encode_postings(doc_parts[i], tf_parts[i], dl_parts[i],
                                 k1=1.2, b=0.75, avgdl=250.0)
        for k in ("docs", "tfs", "dls", "block_last", "block_max"):
            assert multi[k][i] == single[k], (k, df)
        assert multi["df"][i] == single["df"]
        assert multi["cf"][i] == single["cf"]
