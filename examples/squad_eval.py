"""SQuAD v1.1 evaluation under quantization — reproduces the reference's
Table-1 protocol (reference: examples/question_answering/run_qa_no_trainer.py
eval path + run_squad.py fusion-ladder sweep).

Works offline from a local HF checkpoint directory (config.json +
*.safetensors + tokenizer) and a local SQuAD dev JSON
(dev-v1.1.json format).  This is also the CPU-runnable config from
BASELINE.json: MobileBERT-tiny, posit8_1, no fusion.

    python examples/squad_eval.py \
        --model_path /path/to/mobilebert_tiny_squad \
        --squad_json /path/to/dev-v1.1.json \
        --model_type mobilebert \
        --activation posit8_1 --weight posit8_1 \
        --quantize_forward gemm,activation,layernorm,residual,scaling
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_training_tpu.cli import add_qspec_args, quant_config_from_args
from quantized_training_tpu.models.bert import (
    BertConfig, BertForQuestionAnswering,
)
from quantized_training_tpu.models.mobilebert import (
    MobileBertConfig, MobileBertForQuestionAnswering,
)
from quantized_training_tpu.models.hf_loader import (
    convert_bert, convert_mobilebert, load_state_dict_dir,
)
from quantized_training_tpu.utils.evaluation import (
    postprocess_qa_predictions, squad_em_f1,
)


def load_model(path, model_type, qconfig):
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if model_type == "mobilebert":
        cfg = MobileBertConfig(
            vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
            embedding_size=hf.get("embedding_size", 128),
            intra_bottleneck_size=hf.get("intra_bottleneck_size", 128),
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            num_feedforward_networks=hf.get("num_feedforward_networks", 4),
            max_position_embeddings=hf["max_position_embeddings"],
            normalization_type=hf.get("normalization_type", "no_norm"),
            hidden_act=hf.get("hidden_act", "relu"),
            trigram_input=hf.get("trigram_input", True),
            use_bottleneck=hf.get("use_bottleneck", True),
            key_query_shared_bottleneck=hf.get("key_query_shared_bottleneck", True),
        )
        state = load_state_dict_dir(path)
        params = convert_mobilebert(state, cfg.num_hidden_layers,
                                    cfg.num_feedforward_networks)
        model = MobileBertForQuestionAnswering(cfg, qconfig)
    else:
        prefix = "roberta" if model_type == "roberta" else "bert"
        cfg = BertConfig(
            vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 2),
            position_offset=2 if model_type == "roberta" else 0,
        )
        state = load_state_dict_dir(path)
        params = convert_bert(state, cfg.num_hidden_layers, prefix=prefix)
        model = BertForQuestionAnswering(cfg, qconfig)
    return model, params, cfg


def featurize(examples, tokenizer, max_len=384, stride=128):
    """Tokenize question+context with overflowing windows (HF-style)."""
    feats, rows = [], []
    for ex in examples:
        enc = tokenizer(
            ex["question"], ex["context"],
            truncation="only_second", max_length=max_len, stride=stride,
            return_overflowing_tokens=True, return_offsets_mapping=True,
            padding="max_length",
        )
        for i in range(len(enc["input_ids"])):
            seq_ids = enc.sequence_ids(i)
            offsets = [
                o if seq_ids[j] == 1 else None
                for j, o in enumerate(enc["offset_mapping"][i])
            ]
            feats.append({"example_id": ex["id"], "offset_mapping": offsets})
            rows.append({
                "input_ids": enc["input_ids"][i],
                "attention_mask": enc["attention_mask"][i],
                "token_type_ids": enc.get(
                    "token_type_ids", [[0] * max_len])[i]
                if "token_type_ids" in enc else [0] * max_len,
            })
    return feats, rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--model_type", default="bert",
                        choices=["bert", "roberta", "distilbert", "mobilebert"])
    parser.add_argument("--squad_json", required=True)
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=16)
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    model, params, cfg = load_model(args.model_path, args.model_type, qconfig)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    with open(args.squad_json) as f:
        data = json.load(f)["data"]
    examples, references = [], {}
    for article in data:
        for para in article["paragraphs"]:
            for qa in para["qas"]:
                examples.append({"id": qa["id"], "context": para["context"],
                                 "question": qa["question"]})
                references[qa["id"]] = [a["text"] for a in qa["answers"]]
    if args.max_examples:
        examples = examples[: args.max_examples]
        references = {e["id"]: references[e["id"]] for e in examples}

    feats, rows = featurize(examples, tokenizer,
                            max_len=args.max_seq_length)
    fwd = jax.jit(lambda ids, mask, tt: model.apply(
        {"params": params}, ids, mask, tt))

    all_start, all_end = [], []
    bs = args.batch_size
    for i in range(0, len(rows), bs):
        chunk = rows[i:i + bs]
        pad = bs - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        ids = jnp.asarray([r["input_ids"] for r in chunk])
        mask = jnp.asarray([r["attention_mask"] for r in chunk])
        tt = jnp.asarray([r["token_type_ids"] for r in chunk])
        start, end = fwd(ids, mask, tt)
        n = bs - pad
        all_start.append(np.asarray(start)[:n])
        all_end.append(np.asarray(end)[:n])
    start_logits = np.concatenate(all_start)
    end_logits = np.concatenate(all_end)

    preds = postprocess_qa_predictions(examples, feats, start_logits, end_logits)
    metrics = squad_em_f1(preds, references)
    print(json.dumps({**metrics,
                      "activation": args.activation,
                      "weight": args.weight,
                      "quantize_forward": args.quantize_forward}))


if __name__ == "__main__":
    main()
