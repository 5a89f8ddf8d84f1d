"""Multinomial Naive Bayes (ops/classify.py) — exact model math vs a
hand NumPy reference on a tiny fixture, prediction semantics (OOV
skip, tie -> label asc, priors), and broadcast scoring."""

import math

import numpy as np
import pyarrow as pa
import pytest

from icat_lucene_ray.ops.classify import nb_predict, nb_train


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "label": pa.array([r[2] for r in rows], pa.string()),
    }))


TRAIN = [
    (0, "good clean prose", "pos"),
    (1, "good good text", "pos"),
    (2, "spam spam junk", "neg"),
    (3, "junk text", "neg"),
]


def test_nb_train_exact_math(ray_session):
    m = nb_train(_ds(TRAIN), alpha=1.0, min_count=1)
    assert m["labels"] == ["neg", "pos"]
    vocab = ["clean", "good", "junk", "prose", "spam", "text"]
    assert m["vocab"] == vocab
    # counts: pos = clean1 good3 prose1 text1 (T=6);
    #         neg = spam2 junk2 text1 (T=5); V=6
    want_pos = [math.log((c + 1) / (6 + 6))
                for c in (1, 3, 0, 1, 0, 1)]
    want_neg = [math.log((c + 1) / (5 + 6))
                for c in (0, 0, 2, 0, 2, 1)]
    np.testing.assert_allclose(m["loglik"][:, 1], want_pos, rtol=1e-12)
    np.testing.assert_allclose(m["loglik"][:, 0], want_neg, rtol=1e-12)
    np.testing.assert_allclose(m["log_prior"],
                               [math.log(0.5), math.log(0.5)],
                               rtol=1e-12)


def test_nb_predict_matches_serial(ray_session):
    m = nb_train(_ds(TRAIN))
    test = [(10, "good clean stuff", "?"),   # 'stuff' OOV -> skipped
            (11, "spam junk spam", "?"),
            (12, "zz yy xx", "?")]           # all OOV -> prior tie
    out = nb_predict(_ds(test), m, with_scores=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["label_pred"].tolist() == ["pos", "neg", "neg"]
    # doc 12: every token OOV -> score == prior for both labels; the
    # 50/50 priors tie and argmax takes the first (sorted) label
    assert out.loc[2, "score_neg"] == out.loc[2, "score_pos"]
    # doc 10 score by hand: prior + good + clean under pos
    want = math.log(0.5) + math.log(4 / 12) + math.log(2 / 12)
    assert abs(out.loc[0, "score_pos"] - round(want, 6)) <= 1e-6


def test_nb_min_count_prunes_vocab(ray_session):
    m = nb_train(_ds(TRAIN), min_count=2)
    # words with total count >= 2: good(3) junk(2) spam(2) text(2)
    assert m["vocab"] == ["good", "junk", "spam", "text"]


def test_nb_label_with_space_raises(ray_session):
    rows = [(0, "a b", "bad label")]
    with pytest.raises(Exception):
        nb_train(_ds(rows))


def test_nb_broadcast_ref(ray_session):
    import ray

    m = nb_train(_ds(TRAIN))
    ref = ray.put(m)
    a = nb_predict(_ds(TRAIN), ref).to_pandas() \
        .sort_values("doc_id")["label_pred"].tolist()
    assert a == ["pos", "pos", "neg", "neg"]
