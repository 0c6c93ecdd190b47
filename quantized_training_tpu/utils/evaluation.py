"""Evaluation protocols: sliding-window perplexity and SQuAD metrics.

Mirrors the reference's eval harnesses: WikiText perplexity with
max_length-1024 / stride-512 sliding windows (reference:
examples/language_modeling/wikitext.py:138-172, README.md:96-97) and the
SQuAD v1.1 EM/F1 computation (reference:
examples/question_answering/utils_qa.py postprocessing).
"""

import collections
import re
import string
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "sliding_window_perplexity",
    "squad_em_f1",
    "postprocess_qa_predictions",
]


def sliding_window_perplexity(
    forward: Callable[[jax.Array], jax.Array],
    token_ids: np.ndarray,
    max_length: int = 1024,
    stride: int = 512,
    pad_token_id: int = 0,
) -> float:
    """Perplexity over one long token stream with overlapping windows.

    Reference-exact protocol (examples/language_modeling/wikitext.py:146-166):
    window starts iterate ``range(0, seq_len - max_length, stride)`` so every
    window is a full ``max_length`` tokens; per window, only the last
    ``trg_len = end - prev_end`` targets contribute (the -100 masking), each
    window's *mean* NLL is collected, and ppl = exp(mean of window means).
    Tokens after the last full window are never evaluated — the reference
    drops them too.

    Extension for short fixtures: a stream with ``seq_len <= max_length``
    (where the reference loop would run zero windows) is evaluated as one
    truncated window.  ``pad_token_id`` is unused (kept for API
    compatibility) — windows are always taken from real tokens, no padding.
    """
    del pad_token_id
    token_ids = np.asarray(token_ids).reshape(-1)
    seq_len = token_ids.shape[0]

    begins = list(range(0, seq_len - max_length, stride)) or [0]
    window_nlls = []
    prev_end = 0
    for begin in begins:
        end = min(begin + max_length, seq_len)
        trg_len = end - prev_end
        window = token_ids[begin:end]
        logits = np.asarray(forward(jnp.asarray(window[None, :])),
                            dtype=np.float32)[0]

        # next-token NLL; the model "shifts labels left", so a window with
        # trg_len == window length still only yields len-1 loss terms.
        logp = jax.nn.log_softmax(jnp.asarray(logits[:-1]), axis=-1)
        targets = window[1:]
        token_nll = -np.asarray(
            jnp.take_along_axis(
                logp, jnp.asarray(targets[:, None]), axis=-1
            )
        ).squeeze(-1)
        n_valid = min(trg_len, window.shape[0] - 1)
        window_nlls.append(token_nll[-n_valid:].mean())
        prev_end = end

    return float(np.exp(np.mean(window_nlls)))


# ---------------------------------------------------------------------------
# SQuAD v1.1 metrics
# ---------------------------------------------------------------------------

def _normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def _f1(pred: str, gold: str) -> float:
    pred_toks = _normalize_answer(pred).split()
    gold_toks = _normalize_answer(gold).split()
    common = collections.Counter(pred_toks) & collections.Counter(gold_toks)
    num_same = sum(common.values())
    if len(pred_toks) == 0 or len(gold_toks) == 0:
        return float(pred_toks == gold_toks)
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_toks)
    recall = num_same / len(gold_toks)
    return 2 * precision * recall / (precision + recall)


def squad_em_f1(predictions: dict, references: dict) -> dict:
    """EM/F1 over {id: pred_text} vs {id: [gold_texts]}."""
    em, f1 = 0.0, 0.0
    for qid, golds in references.items():
        pred = predictions.get(qid, "")
        em += max(float(_normalize_answer(pred) == _normalize_answer(g))
                  for g in golds)
        f1 += max(_f1(pred, g) for g in golds)
    n = max(len(references), 1)
    return {"exact_match": 100.0 * em / n, "f1": 100.0 * f1 / n}


def postprocess_qa_predictions(
    examples: List[dict],
    features: List[dict],
    start_logits: np.ndarray,
    end_logits: np.ndarray,
    n_best: int = 20,
    max_answer_length: int = 30,
) -> dict:
    """Map start/end logits back to answer text spans.

    ``examples``: [{id, context}]; ``features``: [{example_id,
    offset_mapping, token_is_context}] aligned with the logit rows.
    """
    per_example = collections.defaultdict(list)
    for i, feat in enumerate(features):
        per_example[feat["example_id"]].append(i)

    predictions = {}
    for ex in examples:
        candidates = []
        for fi in per_example[ex["id"]]:
            offsets = features[fi]["offset_mapping"]
            sl, el = start_logits[fi], end_logits[fi]
            start_idx = np.argsort(sl)[-n_best:][::-1]
            end_idx = np.argsort(el)[-n_best:][::-1]
            for si in start_idx:
                for ei in end_idx:
                    if (si >= len(offsets) or ei >= len(offsets)
                            or offsets[si] is None or offsets[ei] is None
                            or ei < si
                            or ei - si + 1 > max_answer_length):
                        continue
                    candidates.append(
                        (float(sl[si] + el[ei]),
                         ex["context"][offsets[si][0]:offsets[ei][1]])
                    )
        predictions[ex["id"]] = (
            max(candidates)[1] if candidates else ""
        )
    return predictions
