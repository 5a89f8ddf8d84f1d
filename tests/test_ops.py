"""Training-data ops: text analysis, dedup family, similarity, multimodal."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


# ---------------- text ops -------------------------------------------------

def test_token_count_matches_split(docs_ds):
    from icat_lucene_ray.ops.text import add_token_count

    out = docs_ds.map_batches(add_token_count, batch_format="pyarrow") \
        .select_columns(["text", "n_tokens"]).take(50)
    for row in out:
        assert row["n_tokens"] == len(row["text"].split(" "))


def test_quality_score(docs_ds):
    from icat_lucene_ray.ops.text import QUALITY_STOPWORDS, add_quality_score

    out = docs_ds.map_batches(add_quality_score, batch_format="pyarrow").take(30)
    for row in out:
        toks = row["text"].split(" ")
        assert row["n_tokens"] == len(toks)
        exp_ratio = sum(t in QUALITY_STOPWORDS for t in toks) / len(toks)
        assert abs(row["stop_ratio"] - exp_ratio) < 1e-12
        assert 0.0 <= row["quality"] <= 1.0


def test_lang_id():
    from icat_lucene_ray.ops.text import LangId

    li = LangId()
    batch = pa.table({"text": pa.array([
        "the cat sat on the mat and it was happy",
        "der hund ist nicht mit der katze auf dem sofa",
        "le chat est dans la maison et il est content",
        "xyzzy qwerty plugh",
    ])})
    out = li(batch)["lang_pred"].to_pylist()
    assert out == ["en", "de", "fr", "und"]


def test_fingerprints_deterministic():
    import hashlib

    from icat_lucene_ray.ops.text import WinnowFingerprint, add_md5_fingerprint

    t = pa.table({"text": pa.array(["a b c d e f g h i j", "a b c d e f g h i j",
                                    "k l m n o p q r s t"])})
    fp = add_md5_fingerprint(t)["fp_md5"].to_pylist()
    assert fp[0] == fp[1] != fp[2]
    assert fp[0] == hashlib.md5(b"a b c d e f g h i j").hexdigest()
    wf = WinnowFingerprint()
    w = wf(t)["fp_winnow"].to_pylist()
    assert w[0] == w[1] != w[2]


# ---------------- dedup ----------------------------------------------------

@pytest.fixture(scope="module")
def dup_ds(ray_session):
    """Corpus with planted exact + near duplicates."""
    import ray.data

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    rng = np.random.default_rng(3)
    for i in range(40):
        toks = [base[int(rng.integers(len(base)))] for _ in range(60)]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    rows.append({"doc_id": 100, "text": rows[0]["text"]})          # exact dup
    near = rows[1]["text"].split()
    near[5] = "CHANGED"
    rows.append({"doc_id": 101, "text": " ".join(near)})           # near dup
    rows.append({"doc_id": 102, "text": rows[2]["text"] + " tail"})  # near dup
    return ray.data.from_items(rows)


def test_exact_dedup(dup_ds):
    from icat_lucene_ray.ops.dedup import exact_dedup

    kept = exact_dedup(dup_ds).to_pandas()
    assert len(kept) == 42  # 43 rows, one exact dup collapses
    assert 0 in set(kept["doc_id"]) and 100 not in set(kept["doc_id"])


def test_minhash_lsh_dedup(dup_ds):
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup

    res = minhash_lsh_dedup(dup_ds, threshold=0.7)
    found = {(a, b) for a, b, _ in res["pairs"]}
    assert (0, 100) in found       # exact dup has jaccard 1.0
    assert (1, 101) in found       # one-token change
    assert (2, 102) in found       # suffix append
    keep = set(res["keep_ds"].to_pandas()["doc_id"].astype(int))
    assert 100 in res["drop"] and 100 not in keep and 0 in keep


def test_minhash_verify_semi_join_path(dup_ds):
    """endpoint_broadcast_cap=0 forces the bucketed semi-join endpoint
    restriction (the path a web-scale pair set takes) — verified pairs
    must be identical to the broadcast path's."""
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup

    import icat_lucene_ray.ops.dedup as dmod

    orig = dmod.verify_pairs_distributed

    def forced(*a, **kw):
        kw["endpoint_broadcast_cap"] = 0
        return orig(*a, **kw)

    dmod.verify_pairs_distributed = forced
    try:
        res = minhash_lsh_dedup(dup_ds, threshold=0.7)
    finally:
        dmod.verify_pairs_distributed = orig
    found = {(a, b) for a, b, _ in res["pairs"]}
    assert {(0, 100), (1, 101), (2, 102)} <= found
    assert 100 in res["drop"]


def test_semi_join_ids_ds(ray_session):
    """Distributed semi-join: only matching left rows survive with the
    full schema; duplicate/unknown keep ids are harmless; empty keep
    side yields an empty dataset with the left schema."""
    import ray.data

    from icat_lucene_ray.ops.dedup import semi_join_ids_ds

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(100)], pa.string())}))
    keep = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([3, 7, 7, 99, 1234], pa.int64())}))
    out = semi_join_ids_ds(ds, keep).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [3, 7, 99]
    assert sorted(out.columns) == ["doc_id", "text"]
    assert out.loc[out["doc_id"] == 3, "text"].iloc[0] == "t3"
    empty = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64())}))
    out_e = semi_join_ids_ds(ds, empty)
    assert out_e.count() == 0
    assert sorted(out_e.schema().base_schema.names) == ["doc_id", "text"]


def test_ngram_jaccard_dedup(dup_ds):
    """Exact blocked n-gram Jaccard: pair values equal a brute-force
    per-pair recomputation (string shingle sets), and the keep/drop
    tail behaves like the other dedup ops."""
    from icat_lucene_ray.ops.dedup import ngram_jaccard_dedup

    res = ngram_jaccard_dedup(dup_ds, threshold=0.7, k=5, block_cols=())
    found = {(a, b): j for a, b, j in res["pairs"]}
    assert found[(0, 100)] == 1.0                 # exact dup
    assert (1, 101) in found and (2, 102) in found

    def brute(sa: str, sb: str, k: int = 5) -> float:
        def sh(s):
            t = s.split()
            if len(t) <= k:
                return {"\x1f".join(t)}
            return {"\x1f".join(t[i:i + k]) for i in range(len(t) - k + 1)}
        A, B = sh(sa), sh(sb)
        return len(A & B) / len(A | B)

    texts = {r["doc_id"]: r["text"] for r in dup_ds.take_all()}
    for (a, b), j in found.items():
        assert abs(j - brute(texts[a], texts[b])) < 1e-12, (a, b)
    keep = set(res["keep_ds"].to_pandas()["doc_id"].astype(int))
    assert 100 in res["drop"] and 100 not in keep and 0 in keep


def test_minhash_jaccard_estimate_close():
    from icat_lucene_ray.ops.dedup import MinHasher, ngram_jaccard

    mh = MinHasher(num_perm=256, bands=32)
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(10, 110))
    est = float(np.mean(mh.signature(a) == mh.signature(b)))
    true = ngram_jaccard(a, b, 5)
    assert abs(est - true) < 0.15


def test_minhash_oph_estimate_close():
    """One-permutation scheme: estimator tracks true Jaccard on
    long-form docs (its intended regime) and is deterministic."""
    from icat_lucene_ray.ops.dedup import MinHasher, ngram_jaccard

    mh = MinHasher(num_perm=128, bands=32, scheme="oph")
    a = " ".join(f"w{i}" for i in range(200))
    b = " ".join(f"w{i}" for i in range(20, 220))
    est = float(np.mean(mh.signature(a) == mh.signature(b)))
    true = ngram_jaccard(a, b, 5)
    assert abs(est - true) < 0.15
    assert np.array_equal(mh.signature(a),
                          MinHasher(scheme="oph").signature(a))


def test_minhash_oph_densification_band_independence():
    """Optimal densification keeps LSH band bins near-independent on
    SHORT docs (the regime where most bins are densified): for pairs
    with true J ~= 1/3, a 4-row band must collide with probability
    ~J^4 (~1.2%), not ~J. The earlier rotation/chained densification
    replicated one shared minimum across whole bands (band collision
    ~J) — measured as a 13 -> 2.1M candidate-pair explosion at 12M
    pages. Also asserts the organic-only donor invariant: every
    densified value is copied verbatim from one of the doc's organic
    bins."""
    from icat_lucene_ray.ops.dedup import MinHasher, _OPH_EMPTY

    mh = MinHasher(num_perm=128, bands=32, shingle_k=1, scheme="oph")
    n_pairs, hits, bands_total = 60, 0, 0
    for p in range(n_pairs):
        # 20-token docs sharing 10 tokens: J = 10/30, ~108 empty bins
        base = p * 1000
        a = " ".join(f"t{base + i}" for i in range(20))
        b = " ".join(f"t{base + i}" for i in range(10, 30))
        sa, sb = mh.signature(a), mh.signature(b)
        ba, bb = (mh.band_hashes(s.reshape(1, -1))[0] for s in (sa, sb))
        hits += int(np.sum(ba == bb))
        bands_total += mh.bands
        # organic-only donors: with shingle_k=1 every signature value
        # must be one of the doc's per-token organic minima
        organic = {int(v) for v in sa if v != _OPH_EMPTY}
        assert {int(v) for v in sa} <= organic
    rate = hits / bands_total
    # J^4 ~= 0.012; chained densification measured ~J ~= 0.33
    assert rate < 0.08, f"band collision rate {rate:.3f} — densified " \
        "bins are correlated across bands (FP factory regression)"


def test_minhash_oph_edge_docs():
    """Zero-shingle and single-shingle docs: no crash, stable shapes;
    two empty docs match on every bin (estimate J=1, the exact-verify
    convention); an empty doc never matches a non-empty one."""
    from icat_lucene_ray.ops.dedup import MinHasher

    mh = MinHasher(num_perm=128, bands=32, scheme="oph")
    sig = mh.signatures(["", "a b", "one two three four five",
                         " ".join(f"w{i}" for i in range(100))])
    assert sig.shape == (4, 128)
    assert np.array_equal(sig[0], mh.signature(""))      # all-sentinel
    assert float(np.mean(sig[0] == sig[3])) == 0.0
    assert float(np.mean(mh.signature("") == sig[0])) == 1.0
    # single-shingle doc: every bin densified from one source value
    assert len(np.unique(sig[2])) <= 128


def test_minhash_auto_scheme_strata(ray_session):
    """scheme='auto' recall across strata: finds short-short,
    long-long AND pivot-straddling near-dup pairs (the double-signed
    window guarantees a straddling pair shares a scheme), with drops
    matching the perm scheme exactly on this corpus."""
    import ray.data

    from icat_lucene_ray.ops.dedup import MinHasher, minhash_lsh_dedup

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(5000)]
    mk = lambda L: " ".join(str(x) for x in rng.choice(vocab, L))
    rows = []
    for i in range(30):  # filler at assorted lengths
        rows.append({"doc_id": i, "text": mk(int(rng.integers(15, 300)))})
    # planted dups: short pair, long pair, pivot-straddling pair
    short = mk(20)
    rows += [{"doc_id": 100, "text": short},
             {"doc_id": 101, "text": short}]
    long_ = mk(250)
    rows += [{"doc_id": 200, "text": long_},
             {"doc_id": 201, "text": long_ + " tailword"}]
    # pivot is 48 shingles (~52 tokens): 46 vs 50 tokens straddles it
    mid = mk(46).split()
    rows += [{"doc_id": 300, "text": " ".join(mid)},
             {"doc_id": 301, "text": " ".join(mid + ["p", "q", "r", "s"])}]
    ds = ray.data.from_items(rows)
    res = minhash_lsh_dedup(ds, threshold=0.7, scheme="auto")
    found = {(a, b) for a, b, _ in res["pairs"]}
    assert (100, 101) in found and (200, 201) in found \
        and (300, 301) in found
    ref = minhash_lsh_dedup(ds, threshold=0.7, scheme="perm")
    assert sorted(res["drop"]) == sorted(ref["drop"])
    # signature matrices are per-stratum; the convenience API refuses
    import pytest
    with pytest.raises(ValueError, match="auto"):
        MinHasher(scheme="auto").signatures(["a b c"])
    with pytest.raises(ValueError, match="threshold"):
        minhash_lsh_dedup(ds, threshold=0.5, scheme="auto")


def test_minhash_lsh_dedup_oph_scheme(dup_ds):
    """scheme='oph' end to end: finds the same planted duplicates as
    the perm scheme on the fixture (60-token docs, inside the regime)
    and produces the identical keep set."""
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup

    res = minhash_lsh_dedup(dup_ds, threshold=0.7, scheme="oph")
    found = {(a, b) for a, b, _ in res["pairs"]}
    assert (0, 100) in found and (1, 101) in found
    ref = minhash_lsh_dedup(dup_ds, threshold=0.7, scheme="perm")
    assert sorted(res["drop"]) == sorted(ref["drop"])
    import pytest
    with pytest.raises(ValueError, match="scheme"):
        minhash_lsh_dedup(dup_ds, scheme="bogus")


def test_simhash_dedup(dup_ds):
    from icat_lucene_ray.ops.dedup import SimHasher, simhash_dedup

    assert SimHasher.simhash64("a b c") == SimHasher.simhash64("a b c")
    res = simhash_dedup(dup_ds, max_hamming=6)
    found = {(a, b) for a, b, _ in res["pairs"]}
    assert (0, 100) in found
    keep = set(res["keep_ds"].to_pandas()["doc_id"].astype(int))
    assert 100 in res["drop"] and 100 not in keep and 0 in keep


def test_embedding_near_dup(ray_session):
    import ray.data

    from icat_lucene_ray.ops.dedup import embedding_near_dup

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 16))
    vecs[20] = vecs[10] + 0.001 * rng.standard_normal(16)  # planted near-dup
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    ds = ray.data.from_items(rows)
    pairs = embedding_near_dup(ds, threshold=0.99)
    assert any(p == 10 and q == 20 for p, q, _ in pairs)


def test_embedding_near_dup_lsh_matches_planted(ray_session):
    """The distributed LSH path finds the planted near-dup pair and
    emits each pair once despite multi-table collisions."""
    import ray.data

    from icat_lucene_ray.ops.dedup import embedding_near_dup

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 16))
    vecs[20] = vecs[10] + 0.001 * rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    ds = ray.data.from_items(rows)
    pairs = embedding_near_dup(ds, threshold=0.99, method="lsh")
    assert any(p == 10 and q == 20 for p, q, _ in pairs)
    keys = [(p, q) for p, q, _ in pairs]
    assert len(keys) == len(set(keys))


def test_embedding_near_dup_cross_block_order(ray_session):
    """Cross-block pairs survive regardless of id ordering in the input
    (ADVICE: only p<q-ordered appends dropped reversed-order pairs)."""
    import ray.data

    from icat_lucene_ray.ops.dedup import embedding_near_dup

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((8, 16))
    vecs[1] = vecs[6] + 0.0005 * rng.standard_normal(16)
    # descending ids + tiny blocks force the pair across blocks with
    # the larger id in the earlier block
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in (7, 6, 5, 4, 3, 2, 1, 0)]
    ds = ray.data.from_items(rows)
    pairs = embedding_near_dup(ds, threshold=0.99, block=2)
    assert any(p == 1 and q == 6 for p, q, _ in pairs)


# ---------------- similarity ----------------------------------------------

def test_brute_force_topk_matches_numpy(emb_ds):
    from icat_lucene_ray.ops.similarity import brute_force_topk

    pdf = emb_ds.to_pandas()
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[0]
    qn = q / np.linalg.norm(q)
    sims = matn @ qn
    order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))[:10]
    expected = pdf["vec_id"].to_numpy()[order].tolist()

    got = brute_force_topk(emb_ds, q, k=10)
    assert got["vec_id"].to_pylist() == expected


def test_ivf_topk_recall(emb_ds):
    from icat_lucene_ray.ops.similarity import brute_force_topk, ivf_topk

    pdf = emb_ds.to_pandas()
    q = np.asarray(pdf["embedding"][3], dtype=np.float64)
    exact = set(brute_force_topk(emb_ds, q, k=10)["vec_id"].to_pylist())
    approx = set(ivf_topk(emb_ds, q, k=10, n_clusters=8, nprobe=5)
                 ["vec_id"].to_pylist())
    # uniform-random embeddings are the worst case for IVF; 5/8 probes
    # should still recover half the true top-10
    assert len(exact & approx) >= 5


def test_hyperplane_buckets_collide(ray_session):
    from icat_lucene_ray.ops.similarity import RandomHyperplaneBucketer

    rng = np.random.default_rng(2)
    v = rng.standard_normal(8)
    t = pa.table({"embedding": pa.array(
        [v.tolist(), (v + 1e-6).tolist(), (-v).tolist()],
        pa.list_(pa.float32()))})
    b = RandomHyperplaneBucketer(dim=8, nbits=16)
    out = b(t)["bucket"].to_pylist()
    assert out[0] == out[1] != out[2]


# ---------------- multimodal ----------------------------------------------

def test_image_decode_plumbing(ray_session):
    import ray.data

    from icat_lucene_ray.ops.multimodal import ImageDecoder, make_fake_image

    rows = [{"doc_id": i, "image": make_fake_image(i)} for i in range(20)]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(ImageDecoder, batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 20
    assert "image" not in out.columns           # blob dropped after decode
    assert out["image_meta"][0]["width"] == 32
    assert len(out["image_feat"][0]) == 3
    # determinism
    out2 = ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=4, concurrency=2).to_pandas()
    a = sorted(map(tuple, out[["doc_id"]].values.tolist()))
    b = sorted(map(tuple, out2[["doc_id"]].values.tolist()))
    assert a == b


def test_real_decoders_probe_guarded():
    """Real decode is guarded by import/binary probes: where the probe
    fails the stage raises NotImplementedError at construction (fail
    fast), so a production container WITH the libs gets real decode
    with no code change."""
    from icat_lucene_ray.ops.multimodal import (
        FrameSampler, ImageDecoder, _decode_image_real, have_image_decoder,
        have_video_decoder,
    )

    if not have_image_decoder():
        with pytest.raises(NotImplementedError):
            _decode_image_real(b"\xff\xd8\xff")
        with pytest.raises(NotImplementedError):
            ImageDecoder(use_fake=False)
    if not have_video_decoder():
        with pytest.raises(NotImplementedError):
            FrameSampler(use_fake=False)


def _wav_bytes(freq: float, n: int = 4800, sr: int = 16000,
               nch: int = 1) -> bytes:
    import io
    import wave

    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    if nch == 2:
        x = np.repeat(x, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_audio_real_wav_decode(ray_session):
    """The REAL audio path (stdlib wave, PCM WAV) works end-to-end in
    the actor-pool stage: metadata from the WAV header, RMS of a 0.5
    sine ≈ 0.5/√2, stereo downmixes to mono."""
    import ray.data

    from icat_lucene_ray.ops.multimodal import (
        AudioFeaturizer, _decode_audio_real,
    )

    rows = [{"doc_id": i, "audio": _wav_bytes(220.0 * (i + 1))}
            for i in range(4)]
    out = (ray.data.from_items(rows)
           .map_batches(AudioFeaturizer, batch_format="pyarrow",
                        fn_constructor_kwargs=dict(use_fake=False),
                        batch_size=2, concurrency=2)
           .to_pandas().sort_values("doc_id"))
    assert len(out) == 4 and "audio" not in out.columns
    assert all(m["sample_rate"] == 16000 for m in out["audio_meta"])
    assert all(abs(m["duration_s"] - 0.3) < 1e-9 for m in out["audio_meta"])
    rms = out["audio_feat"].iloc[0]
    assert all(abs(v - 0.5 / np.sqrt(2)) < 0.01 for v in rms)
    # stereo WAV downmixes to mono with the same length
    x, sr = _decode_audio_real(_wav_bytes(440.0, nch=2))
    assert sr == 16000 and len(x) == 4800
    # non-WAV payload raises the documented NotImplementedError
    with pytest.raises(NotImplementedError):
        _decode_audio_real(b"OggS....")


def test_ivf_persisted_index(emb_ds, tmp_path):
    """Persisted IVF: partition-pruned reads return the same results as
    the recompute-per-query path with identical centroids/probes, and
    recall@10 vs exact stays >=0.5."""
    from icat_lucene_ray.ops.similarity import (
        brute_force_topk, build_ivf_index, ivf_index_topk, ivf_topk,
    )

    out = str(tmp_path / "ivf")
    man = build_ivf_index(emb_ds, out, n_clusters=8)
    assert man["n_clusters"] <= 8
    pdf = emb_ds.to_pandas()
    q = np.asarray(pdf["embedding"][3], dtype=np.float64)
    got = ivf_index_topk(out, q, k=10, nprobe=5)
    # persisted index queries are deterministic (centroids are frozen on
    # disk — unlike ivf_topk, which retrains per call on a sample whose
    # block order Ray does not pin)
    again = ivf_index_topk(out, q, k=10, nprobe=5)
    assert got.equals(again)
    exact = set(brute_force_topk(emb_ds, q, k=10)["vec_id"].to_pylist())
    assert len(exact & set(got["vec_id"].to_pylist())) >= 5
    _ = ivf_topk  # recompute path covered by test_ivf_topk_recall


def test_video_frame_sampler(ray_session):
    """Flat-map video plumbing: one output row per sampled frame,
    deterministic features, blobs dropped before downstream."""
    import ray.data

    from icat_lucene_ray.ops.multimodal import FrameSampler, make_fake_video

    rows = [{"doc_id": i, "video": make_fake_video(i, n_frames=24)}
            for i in range(6)]
    ds = ray.data.from_items(rows)
    out = (ds.map_batches(FrameSampler, fn_constructor_kwargs=dict(stride=10),
                          batch_format="pyarrow", batch_size=2, concurrency=2)
           .to_pandas().sort_values(["doc_id", "frame_idx"]))
    # 24 frames, stride 10 -> frames 0, 10, 20 per video
    assert len(out) == 6 * 3
    assert sorted(set(out["frame_idx"])) == [0, 10, 20]
    assert "video" not in out.columns
    # deterministic: same doc+frame -> same feature
    a = out[(out.doc_id == 1) & (out.frame_idx == 10)]["frame_feat"].iloc[0]
    again = (ray.data.from_items(rows[1:2])
             .map_batches(FrameSampler, fn_constructor_kwargs=dict(stride=10),
                          batch_format="pyarrow", concurrency=1)
             .to_pandas())
    b = again[again.frame_idx == 10]["frame_feat"].iloc[0]
    assert list(a) == list(b)


def test_audio_featurizer(ray_session):
    import ray.data

    from icat_lucene_ray.ops.multimodal import AudioFeaturizer, make_fake_audio

    rows = [{"doc_id": i, "audio": make_fake_audio(i)} for i in range(5)]
    out = (ray.data.from_items(rows)
           .map_batches(AudioFeaturizer, batch_format="pyarrow",
                        batch_size=2, concurrency=2)
           .to_pandas().sort_values("doc_id"))
    assert len(out) == 5 and "audio" not in out.columns
    assert all(len(f) == 8 for f in out["audio_feat"])
    assert all(m["duration_s"] == 0.3 for m in out["audio_meta"])
    # deterministic per doc
    a = out[out.doc_id == 2]["audio_feat"].iloc[0]
    b = AudioFeaturizer()(pa.table({
        "audio": pa.array([make_fake_audio(2)], pa.binary())}))[
        "audio_feat"][0].as_py()
    assert list(a) == b


def test_unit_conversion_si(ray_session):
    """M7 convertUnits/convertValue (Lucene.java:1650-1692): numeric
    values gain SI companions per the run.properties units DSL; unknown
    units leave SI columns null (the reference skips the SI fields)."""
    import ray.data

    from icat_lucene_ray.ops.units import UnitConverter

    rows = [
        {"rid": 0, "numericValue": 2.0, "type_units": "eV"},
        {"rid": 1, "numericValue": 25.0, "type_units": "celsius"},
        {"rid": 2, "numericValue": 300.0, "type_units": "kelvin"},
        {"rid": 3, "numericValue": 1.5, "type_units": "furlongs"},  # unknown
        {"rid": 4, "numericValue": 7.0, "type_units": "J"},  # SI itself
    ]
    out = (ray.data.from_items(rows)
           .map_batches(UnitConverter,
                        fn_constructor_kwargs=dict(
                            value_cols=["numericValue"]),
                        batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    assert abs(out["numericValueSI"][0] - 2.0 * 1.602176634e-19) < 1e-30
    assert out["type_unitsSI"][0] == "J"
    assert abs(out["numericValueSI"][1] - 298.15) < 1e-9  # celsius offset
    assert out["type_unitsSI"][1] == "K"
    assert out["numericValueSI"][2] == 300.0
    assert out["numericValueSI"].isna()[3] and out["type_unitsSI"].isna()[3]
    assert out["numericValueSI"][4] == 7.0 and out["type_unitsSI"][4] == "J"


def test_dedup_distributed_cc_matches_driver(dup_ds):
    """The distributed verify+CC path (forced via cc='distributed') must
    produce the same drop set / component partition as the driver
    union-find path — and must never materialize the pair set on the
    driver (result carries labels_ds + O(nodes) drop ids only)."""
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup, simhash_dedup

    drv = minhash_lsh_dedup(dup_ds, threshold=0.7, cc="driver")
    dist = minhash_lsh_dedup(dup_ds, threshold=0.7, cc="distributed")
    assert dist["cc_mode"] == "distributed" and drv["cc_mode"] == "driver"
    # O(clusters) driver contract: no pair list, no clusters dict
    assert dist["pairs"] is None and dist["clusters"] is None
    assert dist["labels_ds"] is not None
    assert dist["drop"] == drv["drop"]
    # labels agree with union-find roots (both are component minima)
    labels = {int(r["node"]): int(r["label"])
              for r in dist["labels_ds"].take_all()}
    assert labels == drv["clusters"]

    sdrv = simhash_dedup(dup_ds, max_hamming=6, cc="driver")
    sdist = simhash_dedup(dup_ds, max_hamming=6, cc="distributed")
    assert sdist["drop"] == sdrv["drop"]
    slabels = {int(r["node"]): int(r["label"])
               for r in sdist["labels_ds"].take_all()}
    assert slabels == sdrv["clusters"]


def test_connected_components_labels_chain(ray_session):
    """Min-label propagation converges across a multi-hop chain (needs
    >1 round) and across disjoint components."""
    import ray.data

    from icat_lucene_ray.ops.dedup import connected_components_labels

    edges = ray.data.from_items([
        {"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3},
        {"id_a": 3, "id_b": 4}, {"id_a": 4, "id_b": 5},
        {"id_a": 10, "id_b": 11},
        {"id_a": 20, "id_b": 21}, {"id_a": 21, "id_b": 22},
    ])
    labels = {int(r["node"]): int(r["label"])
              for r in connected_components_labels(edges).take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                      10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_anti_join_ids_ds(ray_session):
    """Distributed anti-join: full left schema survives, drop ids are
    removed, unknown drop ids are harmless, empty drop short-circuits."""
    import ray.data

    from icat_lucene_ray.ops.dedup import anti_join_ids_ds

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(100)], pa.string())}))
    drop = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([3, 7, 99, 1234], pa.int64())}))
    out = anti_join_ids_ds(ds, drop).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [i for i in range(100)
                                   if i not in (3, 7, 99)]
    assert sorted(out.columns) == ["doc_id", "text"]
    assert out.loc[out["doc_id"] == 0, "text"].iloc[0] == "t0"
    empty = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64())}))
    assert anti_join_ids_ds(ds, empty) is ds


def test_dedup_distributed_drop_never_on_driver(dup_ds):
    """Above cc_driver_cap the drop list is NOT materialized on the
    driver (drop=None, the 100-TB contract); keep_ds comes from the
    distributed anti-join and still matches the driver-path survivors."""
    from icat_lucene_ray.ops.dedup import minhash_lsh_dedup

    drv = minhash_lsh_dedup(dup_ds, threshold=0.7, cc="driver")
    dist = minhash_lsh_dedup(dup_ds, threshold=0.7, cc="distributed",
                             cc_driver_cap=0)
    assert dist["drop"] is None
    assert dist["n_drop"] == len(drv["drop"])
    assert sorted(dist["drop_ds"].to_pandas()["doc_id"].astype(int)) \
        == drv["drop"]
    keep_drv = sorted(drv["keep_ds"].to_pandas()["doc_id"].astype(int))
    keep_dist = sorted(dist["keep_ds"].to_pandas()["doc_id"].astype(int))
    assert keep_dist == keep_drv


def test_repeated_ngrams(ray_session):
    """Cross-doc repeated n-gram audit: spans in >= min_docs distinct
    docs survive; within-doc repeats don't inflate the doc count."""
    import ray.data

    from icat_lucene_ray.ops.text import repeated_ngrams

    shared = "alpha beta gamma delta"
    docs = [
        f"x {shared} y",
        f"p q {shared}",
        f"{shared} {shared} tail",   # repeats INSIDE one doc: counts once
        "totally unrelated words here now",
        "",                            # empty doc: no windows
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    out = repeated_ngrams(ds, n=4, min_docs=2, top_k=10).to_pandas()
    got = dict(zip(out["ngram"], out["n_docs"]))
    assert got[shared] == 3
    assert all(v >= 2 for v in got.values())
    assert "totally unrelated words here" not in got
    # ordering: n_docs DESC then ngram ASC
    assert list(out["n_docs"]) == sorted(out["n_docs"], reverse=True)


def test_ivf_topk_guard_points_at_persisted_index(emb_ds, tmp_path):
    """VERDICT item: the ad hoc ivf_topk re-assigns the whole corpus per
    call, so above max_rows it must refuse and point at the persisted
    path — and the persisted path must answer the same query."""
    from icat_lucene_ray.ops.similarity import (
        build_ivf_index, ivf_index_topk, ivf_topk,
    )

    pdf = emb_ds.to_pandas()
    q = np.asarray(pdf["embedding"][3], dtype=np.float64)
    with pytest.raises(ValueError, match="build_ivf_index"):
        ivf_topk(emb_ds, q, k=10, max_rows=10)
    out = str(tmp_path / "ivf_guard")
    build_ivf_index(emb_ds, out, n_clusters=8)
    got = ivf_index_topk(out, q, k=10, nprobe=5)
    assert len(got) == 10


def test_kmeans_init_sample_deterministic(emb_ds):
    """ADVICE regression: the init sample is the id-smallest rows —
    a pure function of the data (Dataset.limit's block subset is
    task-order dependent), so two fits over a SHUFFLED copy of the
    same rows produce bit-identical centroids even when the sample cap
    is smaller than the table."""
    from icat_lucene_ray.ops.similarity import _init_sample_rows, kmeans_fit

    n = emb_ds.count()
    cap = max(64, n // 4)  # force the sample to be a strict subset
    s1 = _init_sample_rows(emb_ds, cap, "vec_id", "embedding")
    s2 = _init_sample_rows(emb_ds.random_shuffle(seed=3), cap,
                           "vec_id", "embedding")
    assert list(s1["vec_id"]) == sorted(s1["vec_id"])
    assert list(s1["vec_id"]) == list(s2["vec_id"])

    # same block layout -> bit-identical; shuffled layout -> same init,
    # centroids equal up to partial-sum float association (block
    # boundaries change the accumulation order, not the math)
    c1 = kmeans_fit(emb_ds, k=4, iters=2, init_sample=cap)
    c1b = kmeans_fit(emb_ds, k=4, iters=2, init_sample=cap)
    assert np.array_equal(c1, c1b)
    c2 = kmeans_fit(emb_ds.random_shuffle(seed=3), k=4, iters=2,
                    init_sample=cap)
    assert np.allclose(c1, c2, atol=1e-9)


# ---------------- exact substring dedup (Lee et al. semantics) ----------

def test_substring_dedup_known_spans(ray_session):
    import ray.data

    from icat_lucene_ray.ops.text import substring_dedup

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": [
            "alpha beta gamma delta unique one two",
            "prefix alpha beta gamma delta suffix",
            "totally different words here now",
            "self repeat q w e r q w e r tail",
            "short doc",  # < min_len tokens: untouched
        ],
    })
    out = (substring_dedup(ray.data.from_arrow(docs), min_len=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == [
        "unique one two",          # cross-doc 4-gram removed
        "prefix suffix",
        "totally different words here now",
        "self repeat tail",        # same-doc repeat: both occurrences
        "short doc",
    ]
    assert out["removed"].tolist() == [4, 4, 0, 8, 0]


def test_substring_dedup_all_removed_and_whitespace(ray_session):
    import ray.data

    from icat_lucene_ray.ops.text import substring_dedup

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["a b c d", "a  b\tc d", ""],  # doc1: messy whitespace
    })
    out = (substring_dedup(ray.data.from_arrow(docs), min_len=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # docs 0 and 1 are the same 4-gram after tokenization -> both empty
    assert out["text"].tolist() == ["", "", ""]
    assert out["removed"].tolist() == [4, 4, 0]


def test_substring_dedup_matches_brute_force(ray_session):
    """Randomized corpus vs a brute-force recompute of the semantics."""
    import ray.data

    from icat_lucene_ray.ops.text import substring_dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 25)))
             for _ in range(120)]
    L = 3
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": texts})
    out = (substring_dedup(ray.data.from_arrow(docs), min_len=L,
                           num_buckets=16, join_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    from collections import Counter
    toks = [t.split() for t in texts]
    cnt = Counter(tuple(tk[i:i + L]) for tk in toks
                  for i in range(len(tk) - L + 1))
    for d, tk in enumerate(toks):
        covered = set()
        for i in range(len(tk) - L + 1):
            if cnt[tuple(tk[i:i + L])] >= 2:
                covered.update(range(i, i + L))
        kept = [w for i, w in enumerate(tk) if i not in covered]
        assert out["text"][d] == " ".join(kept), d
        assert out["removed"][d] == len(covered), d
