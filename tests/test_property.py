"""Property-based (hypothesis) checks for the pure kernels whose edge
cases are easy to miss with examples: the bit-packed block codec and
the vectorized shingle builder."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from icat_lucene_ray.index.codec import decode_u64_blocks, encode_u64_blocks
from icat_lucene_ray.ops.dedup import _ngram_shingle_strings

u64s = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    min_size=0, max_size=700)


@settings(max_examples=200, deadline=None)
@given(u64s)
def test_codec_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = encode_u64_blocks(arr)
    out = decode_u64_blocks(buf)
    assert out.dtype == np.uint64
    assert np.array_equal(out, arr)


@settings(max_examples=100, deadline=None)
@given(u64s, st.data())
def test_codec_partial_block_decode(vals, data):
    """Decoding any block subset equals slicing the full decode."""
    arr = np.array(vals, dtype=np.uint64)
    block = 128
    # mask length must equal the encoded block count (0 when empty —
    # that's the caller contract; masks come from block metadata)
    nblocks = -(-len(arr) // block)
    if nblocks == 0:
        return
    mask = np.array(
        data.draw(st.lists(st.booleans(), min_size=nblocks,
                           max_size=nblocks)), dtype=bool)
    buf = encode_u64_blocks(arr, block=block)
    got = decode_u64_blocks(buf, block=block, block_mask=mask)
    # contract: full value count, unselected blocks zeroed
    want = decode_u64_blocks(buf, block=block).copy()
    for i in range(nblocks):
        if not mask[i]:
            want[i * block:(i + 1) * block] = 0
    assert np.array_equal(got, want)


def _shingles_ref(text: str, k: int) -> list[str]:
    # RE2 \s is ASCII [\t\n\f\r ] (no \x0b, no unicode spaces) — the
    # engine (Arrow RE2) and the DuckDB oracle (also RE2) agree on
    # this; Python re's unicode-aware \s does NOT, so the reference
    # spells the class out.
    toks = [t for t in re.split(r"[\t\n\f\r ]+", text) if t]
    if len(toks) <= k:
        return ["\x1f".join(toks)]
    return ["\x1f".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


texts = st.lists(
    st.text(alphabet=st.characters(
        blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        max_size=60),
    min_size=0, max_size=25)


@settings(max_examples=150, deadline=None)
@given(texts, st.integers(min_value=1, max_value=6))
def test_shingle_strings_match_reference(ts, k):
    off, sh = _ngram_shingle_strings(pa.array(ts, pa.string()), k)
    assert len(off) == len(ts) + 1
    for i, t in enumerate(ts):
        got = sh.slice(off[i], off[i + 1] - off[i]).to_pylist()
        assert got == _shingles_ref(t, k), (i, t, k)
