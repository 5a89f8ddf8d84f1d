"""Distributed multinomial Naive Bayes text classification — the
classic seed-labeled corpus-filter shape (CCNet / GPT-3-style "quality"
classifiers train a cheap linear model on labeled seed sets, then score
the whole corpus; fastText's supervised mode is the same idea with
bigrams). Reference parity note: the reference engine has no model
surface — this is one of the beyond-reference LLM-data-pipeline
operators (SURVEY.md round-5 scope).

Train is two shuffle-light passes over the labeled seed set:
per-batch combiners collapse blocks to (label, word, count) partials
(vocabulary-sized, never per-token rows) and one small
``groupby(key)`` folds them; priors come from per-batch label counts.
The fitted model — log priors plus a dense (V x k) smoothed
log-likelihood matrix — is broadcast ONCE via ``ray.put`` and scoring
is a single stateless ``map_batches`` pass (dictionary-encode the
batch's tokens, gather per-label rows for the unique words only,
``np.add.reduceat`` per doc): no shuffle, O(model) per node, O(1)
driver traffic.

Semantics (kept SQL-restatable so the driver oracle can recompute the
model bit-for-bit):
- tokens = space-split of the text column (the corpus is pre-analyzed
  text, same convention as ``unigram_logprob``); empty tokens dropped.
- vocabulary = train-set words with total count >= ``min_count``
  (thresholding, not top-k — deterministic under ties).
- P(w|l) = (c_lw + alpha) / (T_l + alpha*V) with T_l the label's
  total count over vocabulary words; out-of-vocabulary words are
  SKIPPED at predict time (standard MNB practice).
- score(d,l) = ln prior_l + sum over in-vocab tokens of ln P(w|l);
  prediction = argmax, ties broken by label sort order (numpy argmax
  first-wins over the sorted label axis).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["nb_train", "nb_predict"]

# joins (label, word) into one groupby key: a space can never appear
# inside a token (tokens ARE space-splits) and — unlike "\x00" — it
# survives numpy's fixed-width U dtype, which strips trailing NUL
# padding. Labels therefore must not contain spaces (asserted).
_SEP = " "


def _tokens(batch: pa.Table, col: str) -> pa.ListArray:
    flat = pc.split_pattern(batch[col], " ")
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat


def _label_word_partial(batch: pa.Table, text_col: str,
                        label_col: str) -> pa.Table:
    """Per-batch combiner: (label, word) partial counts + per-label doc
    counts (word = '' rows carry the doc counts; '' can never be a
    token because split_pattern drops nothing but we filter empties)."""
    toks = _tokens(batch, text_col)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    flat = toks.flatten()
    labels = batch[label_col].to_numpy(zero_copy_only=False)
    if any(_SEP in l for l in set(labels.tolist())):
        raise ValueError("labels must not contain spaces")
    tok_label = np.repeat(labels, lens)
    words = flat.to_numpy(zero_copy_only=False)
    nonempty = words != ""
    key = np.char.add(np.char.add(tok_label[nonempty].astype("U"), _SEP),
                      words[nonempty].astype("U"))
    uk, c = np.unique(key, return_counts=True)
    # per-label doc counts ride along as (label, '') rows
    ul, dc = np.unique(labels.astype("U"), return_counts=True)
    return pa.table({
        "key": pa.array(np.concatenate([uk, np.char.add(ul, _SEP)]),
                        pa.string()),
        "c": pa.array(np.concatenate([c, dc]).astype(np.int64)),
    })


def nb_train(ds, text_col: str = "text", label_col: str = "label", *,
             alpha: float = 1.0, min_count: int = 1) -> dict:
    """Fit multinomial NB on a labeled Ray Dataset; returns the model
    dict consumed by :func:`nb_predict` (plain numpy — ``ray.put``-able
    and picklable)."""
    counts = ds.map_batches(
        lambda b: _label_word_partial(b, text_col, label_col),
        batch_format="pyarrow").groupby("key").sum("c")
    lw: dict[tuple[str, str], int] = {}
    doc_counts: dict[str, int] = {}
    word_tot: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for k, c in zip(b["key"].to_pylist(),
                        b["sum(c)"].to_pylist()):
            label, word = k.split(_SEP, 1)
            if word == "":
                doc_counts[label] = doc_counts.get(label, 0) + int(c)
            else:
                lw[(label, word)] = lw.get((label, word), 0) + int(c)
                word_tot[word] = word_tot.get(word, 0) + int(c)
    labels = sorted(doc_counts)
    vocab = sorted(w for w, t in word_tot.items() if t >= min_count)
    widx = {w: i for i, w in enumerate(vocab)}
    k, v = len(labels), len(vocab)
    cm = np.zeros((v, k), dtype=np.float64)
    for (label, word), c in lw.items():
        if word in widx:
            cm[widx[word], labels.index(label)] = c
    tot = cm.sum(axis=0)
    loglik = np.log((cm + alpha) / (tot + alpha * v))
    n_docs = sum(doc_counts.values())
    log_prior = np.log(np.array([doc_counts[l] for l in labels],
                                dtype=np.float64) / n_docs)
    return {"labels": labels, "vocab": vocab, "log_prior": log_prior,
            "loglik": loglik, "alpha": alpha,
            "log_oov": np.log(alpha / (tot + alpha * v))}


def nb_predict(ds, model_or_ref, text_col: str = "text",
               id_col: str = "doc_id", *, with_scores: bool = False):
    """Score a corpus under a fitted NB model: one stateless
    ``map_batches`` pass, model broadcast once (pass a ``ray.put`` ref
    to share across tasks; a plain dict also works). Output columns:
    ``(id_col, label_pred[, score_<label>...])`` — scores are rounded
    to 6 dp, matching the repo's float-emission convention."""
    import ray

    ref = (model_or_ref if isinstance(model_or_ref, ray.ObjectRef)
           else ray.put(model_or_ref))

    def _score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = ray.get(ref)
        labels, vocab = m["labels"], m["vocab"]
        toks = _tokens(batch, text_col)
        offsets = toks.offsets.to_numpy(zero_copy_only=False) \
                      .astype(np.int64)
        lens = np.diff(offsets)
        enc = toks.flatten().dictionary_encode()
        uniq = pd.Index(enc.dictionary.to_pylist())
        vix = pd.Index(vocab).get_indexer(uniq)          # -1 = OOV
        # per-unique-word per-label loglik rows; OOV rows contribute 0
        rows = np.zeros((len(uniq), len(labels)), dtype=np.float64)
        known = vix >= 0
        rows[known] = m["loglik"][vix[known]]
        per_tok = rows[enc.indices.to_numpy(zero_copy_only=False)]
        sums = np.zeros((len(lens), len(labels)), dtype=np.float64)
        nz = lens > 0
        if per_tok.size and nz.any():
            sums[nz] = np.add.reduceat(per_tok, offsets[:-1][nz], axis=0)
        scores = sums + m["log_prior"]
        pred = np.asarray(labels, dtype=object)[np.argmax(scores, axis=1)]
        out = {id_col: batch[id_col],
               "label_pred": pa.array(pred.astype("U"), pa.string())}
        if with_scores:
            for j, l in enumerate(labels):
                out[f"score_{l}"] = pa.array(np.round(scores[:, j], 6))
        return pa.table(out)

    return ds.map_batches(_score, batch_format="pyarrow")
