"""GLUE fine-tuning with LoRA + QAT — reference:
examples/text_classification/run_glue_no_trainer.py (eager quantize flow).

Offline-friendly: takes a local HF checkpoint dir and a local GLUE task data
file (tsv/json via datasets if available).  Demonstrates the full QAT recipe:
LoRA adapters, forward activation/weight quantization, backward error
quantization, delayed-scaling observers threaded through the jitted step.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from quantized_training_tpu.cli import add_qspec_args, quant_config_from_args
from quantized_training_tpu.models.bert import (
    BertConfig, BertForSequenceClassification,
)
from quantized_training_tpu.models.hf_loader import (
    convert_bert, load_state_dict_dir,
)
from quantized_training_tpu.training import (
    TrainState, classification_loss, make_train_step, save_checkpoint,
)

TASK_KEYS = {
    "mnli": ("premise", "hypothesis", 3),
    "qnli": ("question", "sentence", 2),
    "mrpc": ("sentence1", "sentence2", 2),
    "sst2": ("sentence", None, 2),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--task_name", default="mrpc", choices=TASK_KEYS)
    parser.add_argument("--data_json", default=None,
                        help="local JSONL with task fields + label")
    parser.add_argument("--max_steps", type=int, default=None)
    add_qspec_args(parser)
    args = parser.parse_args()

    key_a, key_b, num_labels = TASK_KEYS[args.task_name]
    qconfig = quant_config_from_args(args)

    with open(os.path.join(args.model_path, "config.json")) as f:
        hf = json.load(f)
    cfg = BertConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        num_labels=num_labels,
    )
    params = convert_bert(load_state_dict_dir(args.model_path),
                          cfg.num_hidden_layers)
    model = BertForSequenceClassification(cfg, qconfig)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    if args.data_json:
        with open(args.data_json) as f:
            rows = [json.loads(line) for line in f]
    else:
        from datasets import load_dataset
        rows = list(load_dataset("glue", args.task_name, split="train"))

    def encode(row):
        texts = (row[key_a],) if key_b is None else (row[key_a], row[key_b])
        enc = tokenizer(*texts, truncation=True, padding="max_length",
                        max_length=args.max_seq_length)
        return enc["input_ids"], enc["attention_mask"], row["label"]

    encoded = [encode(r) for r in rows]
    rng = np.random.default_rng(args.seed)

    # init with converted params merged over random init (heads may be fresh)
    ids0 = jnp.asarray([encoded[0][0]])
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), ids0)
    merged = dict(variables["params"])
    merged.update(params)
    variables = {**variables, "params": merged}

    tx = optax.adamw(args.learning_rate)
    state = TrainState.create(model, variables, tx)
    step_fn = make_train_step(model, tx, classification_loss)

    bs = args.per_device_train_batch_size
    steps = 0
    for epoch in range(args.num_train_epochs):
        order = rng.permutation(len(encoded))
        for i in range(0, len(order) - bs + 1, bs):
            batch_rows = [encoded[j] for j in order[i:i + bs]]
            batch = {
                "input_ids": jnp.asarray([r[0] for r in batch_rows]),
                "attention_mask": jnp.asarray([r[1] for r in batch_rows]),
                "labels": jnp.asarray([r[2] for r in batch_rows]),
            }
            state, loss = step_fn(state, batch)
            steps += 1
            if steps % 50 == 0:
                print(f"epoch {epoch} step {steps} loss {float(loss):.4f}",
                      flush=True)
            if args.max_steps and steps >= args.max_steps:
                break
        if args.max_steps and steps >= args.max_steps:
            break

    os.makedirs(args.output_dir, exist_ok=True)
    save_checkpoint(os.path.abspath(
        os.path.join(args.output_dir, "checkpoint")), state)
    print(json.dumps({"steps": steps, "final_loss": float(loss)}))


if __name__ == "__main__":
    main()
