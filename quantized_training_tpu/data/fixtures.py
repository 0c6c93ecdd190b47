"""Synthetic offline fixtures: HF-format checkpoints, tokenizers, datasets.

The accuracy-table drivers (``examples/run_qa.py``, ``run_glue.py``,
``run_squad.py``) consume a HuggingFace checkpoint directory plus a local
dataset file — artifacts this zero-egress environment cannot download.  These
generators write *real-shaped* stand-ins: the directory layout, file formats,
weight names, and tokenizer files are exactly what the drivers expect from a
mounted real checkpoint (reference counterpart: the downloaded
``models/mobilebert_tiny`` dir + SQuAD/GLUE files its
run_quantized_training.py:118-160 commands consume), so the full pipeline —
launcher -> training -> eval -> ladder CSV — can be rehearsed end-to-end and a
real checkpoint is a drop-in replacement.

Geometry is scaled down by default (CPU-speed rehearsal) but every structural
feature is kept: trigram input + bottlenecks for MobileBERT, token types for
BERT, max_position_embeddings >= 512 so the unedited --max_seq_length 384
commands run.
"""

import json
import os
import random
import string
from typing import List, Optional

__all__ = [
    "FIXTURE_VOCAB",
    "write_tokenizer",
    "write_mobilebert_checkpoint",
    "write_bert_checkpoint",
    "write_squad_json",
    "write_glue_jsonl",
]

_SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
# Whole words (they wordpiece to themselves) keeps the synthetic corpus
# aligned token-for-character, so answer spans survive tokenization.
_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "river", "stone",
    "cloud", "ember", "frost", "grove", "haven", "isle", "lake",
    "meadow", "north", "ocean", "pine", "quarry", "ridge", "summit",
    "trail", "valley", "wind", "what", "is", "the", "of", "in", "a",
    "was", "built", "near", "city", "famous", "for", "its", "old",
    "found", "who", "where",
]
FIXTURE_VOCAB: List[str] = list(dict.fromkeys(
    _SPECIALS + _WORDS + list(string.ascii_lowercase)
    + [str(d) for d in range(10)] + [",", ".", "?", "##s"]
))


def write_tokenizer(path: str) -> None:
    """Write vocab.txt + tokenizer_config.json loadable by AutoTokenizer."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "vocab.txt"), "w") as f:
        f.write("\n".join(FIXTURE_VOCAB) + "\n")
    from transformers import BertTokenizerFast

    tok = BertTokenizerFast(vocab_file=os.path.join(path, "vocab.txt"),
                            do_lower_case=True)
    tok.save_pretrained(path)


def write_mobilebert_checkpoint(
    path: str,
    *,
    num_hidden_layers: int = 4,
    hidden_size: int = 128,
    embedding_size: int = 32,
    intra_bottleneck_size: int = 64,
    num_attention_heads: int = 4,
    intermediate_size: int = 128,
    num_feedforward_networks: int = 2,
    head: str = "qa",
    num_labels: int = 2,
    seed: int = 0,
) -> str:
    """Random-init HF MobileBert checkpoint dir (config + safetensors +
    tokenizer).  Defaults are a CPU-speed shrink of mobilebert_tiny with all
    structural features (trigram input, shared KQ bottleneck, no_norm)."""
    import torch
    import transformers

    write_tokenizer(path)
    cfg = transformers.MobileBertConfig(
        vocab_size=len(FIXTURE_VOCAB),
        hidden_size=hidden_size,
        embedding_size=embedding_size,
        intra_bottleneck_size=intra_bottleneck_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        intermediate_size=intermediate_size,
        num_feedforward_networks=num_feedforward_networks,
        max_position_embeddings=512,
        normalization_type="no_norm",
        hidden_act="relu",
        trigram_input=True,
        use_bottleneck=True,
        key_query_shared_bottleneck=True,
        num_labels=num_labels,
    )
    torch.manual_seed(seed)
    cls = (transformers.MobileBertForQuestionAnswering if head == "qa"
           else transformers.MobileBertForSequenceClassification)
    model = cls(cfg)
    model.save_pretrained(path, safe_serialization=True)
    return path


def write_bert_checkpoint(
    path: str,
    *,
    num_hidden_layers: int = 2,
    hidden_size: int = 64,
    num_attention_heads: int = 4,
    intermediate_size: int = 128,
    head: str = "qa",
    num_labels: int = 2,
    seed: int = 0,
) -> str:
    import torch
    import transformers

    write_tokenizer(path)
    cfg = transformers.BertConfig(
        vocab_size=len(FIXTURE_VOCAB),
        hidden_size=hidden_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        intermediate_size=intermediate_size,
        max_position_embeddings=512,
        num_labels=num_labels,
    )
    torch.manual_seed(seed)
    cls = (transformers.BertForQuestionAnswering if head == "qa"
           else transformers.BertForSequenceClassification)
    model = cls(cfg)
    model.save_pretrained(path, safe_serialization=True)
    return path


def _sentence(rng: random.Random, n: int) -> List[str]:
    return [rng.choice(_WORDS) for _ in range(n)]


def write_squad_json(path: str, n_questions: int = 16,
                     seed: int = 0) -> str:
    """SQuAD v1.1-format JSON whose answers are real context substrings."""
    rng = random.Random(seed)
    paragraphs = []
    for q in range(n_questions):
        words = _sentence(rng, rng.randint(20, 40))
        a0 = rng.randrange(0, len(words) - 3)
        alen = rng.randint(1, 3)
        context = " ".join(words)
        answer_text = " ".join(words[a0:a0 + alen])
        answer_start = len(" ".join(words[:a0])) + (1 if a0 else 0)
        assert context[answer_start:answer_start + len(answer_text)] \
            == answer_text
        paragraphs.append({
            "context": context,
            "qas": [{
                "id": f"syn{q:04d}",
                "question": " ".join(["what", "is"] + _sentence(rng, 4)
                                     + ["?"]),
                "answers": [{"text": answer_text,
                             "answer_start": answer_start}],
            }],
        })
    payload = {"version": "1.1",
               "data": [{"title": "synthetic", "paragraphs": paragraphs}]}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def write_glue_jsonl(path: str, task: str = "mrpc", n: int = 32,
                     seed: int = 0) -> str:
    """JSONL rows with the task's text fields + integer label."""
    fields = {
        "mnli": ("premise", "hypothesis", 3),
        "qnli": ("question", "sentence", 2),
        "mrpc": ("sentence1", "sentence2", 2),
        "sst2": ("sentence", None, 2),
    }[task]
    key_a, key_b, num_labels = fields
    rng = random.Random(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(n):
            row = {key_a: " ".join(_sentence(rng, rng.randint(6, 14))),
                   "label": rng.randrange(num_labels)}
            if key_b:
                row[key_b] = " ".join(_sentence(rng, rng.randint(6, 14)))
            f.write(json.dumps(row) + "\n")
    return path
