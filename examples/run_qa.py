"""SQuAD fine-tuning with LoRA + QAT, then EM/F1 eval — the training driver
the launcher's ``--task squad`` commands execute (reference:
examples/question_answering/run_qa_no_trainer.py — training loop + eval;
utils_qa.py — postprocessing; the command shape comes from
run_quantized_training.py:118-160).

Offline-friendly: local HF checkpoint dir + local SQuAD-format JSON (train
and eval can be the same file for smoke rehearsal).  The fusion-ladder sweep
over an already-trained checkpoint lives in run_squad.py.

    python examples/run_qa.py --model_path ckpts/mobilebert_tiny \
        --model_type mobilebert --squad_json train-v1.1.json \
        --quantize_forward gemm --quantize_backprop gemm \
        --activation posit8_1 --weight posit8_1 \
        --lora_rank 8 --lora_target_modules query,key,value,dense
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from quantized_training_tpu.cli import add_qspec_args, quant_config_from_args
from quantized_training_tpu.training import (
    TrainState, make_train_step, save_checkpoint,
)
from quantized_training_tpu.utils.evaluation import (
    postprocess_qa_predictions, squad_em_f1,
)
from squad_eval import featurize, load_model


def load_squad(path):
    with open(path) as f:
        data = json.load(f)["data"]
    examples, references = [], {}
    for article in data:
        for para in article["paragraphs"]:
            for qa in para["qas"]:
                examples.append({
                    "id": qa["id"], "context": para["context"],
                    "question": qa["question"],
                    "answers": qa.get("answers", []),
                })
                references[qa["id"]] = [a["text"] for a in qa["answers"]]
    return examples, references


def featurize_train(examples, tokenizer, max_len=384, stride=128):
    """Tokenize with overflow windows and label answer start/end token
    positions (reference run_qa_no_trainer.py prepare_train_features)."""
    rows = []
    for ex in examples:
        enc = tokenizer(
            ex["question"], ex["context"],
            truncation="only_second", max_length=max_len, stride=stride,
            return_overflowing_tokens=True, return_offsets_mapping=True,
            padding="max_length",
        )
        ans = ex["answers"][0]
        a_start = ans["answer_start"]
        a_end = a_start + len(ans["text"])
        for i in range(len(enc["input_ids"])):
            seq_ids = enc.sequence_ids(i)
            offsets = enc["offset_mapping"][i]
            ctx = [j for j, s in enumerate(seq_ids) if s == 1]
            # cls position when the answer is not inside this window
            start_tok = end_tok = 0
            if ctx and offsets[ctx[0]][0] <= a_start \
                    and offsets[ctx[-1]][1] >= a_end:
                for j in ctx:
                    if offsets[j][0] <= a_start < offsets[j][1]:
                        start_tok = j
                    if offsets[j][0] < a_end <= offsets[j][1]:
                        end_tok = j
            rows.append({
                "input_ids": enc["input_ids"][i],
                "attention_mask": enc["attention_mask"][i],
                "token_type_ids": enc.get("token_type_ids",
                                          [[0] * max_len] * (i + 1))[i],
                "start": start_tok, "end": end_tok,
            })
    return rows


def qa_loss(logits, batch):
    start_logits, end_logits = logits
    def ce(lg, pos):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, pos[:, None],
                                             axis=-1))
    return 0.5 * (ce(start_logits, batch["start"])
                  + ce(end_logits, batch["end"]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--model_type", default="mobilebert",
                        choices=["bert", "roberta", "mobilebert"])
    parser.add_argument("--squad_json", required=True,
                        help="SQuAD v1.1-format train JSON")
    parser.add_argument("--eval_json", default=None,
                        help="eval JSON (default: --squad_json)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_examples", type=int, default=None)
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    model, params, cfg = load_model(args.model_path, args.model_type, qconfig)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    train_ex, _ = load_squad(args.squad_json)
    if args.max_examples:
        train_ex = train_ex[: args.max_examples]
    rows = featurize_train(train_ex, tokenizer,
                           max_len=args.max_seq_length)

    ids0 = jnp.asarray([rows[0]["input_ids"]])
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), ids0)
    merged = dict(variables["params"])
    merged.update(params)
    variables = {**variables, "params": merged}

    tx = optax.adamw(args.learning_rate)
    state = TrainState.create(model, variables, tx)

    def model_inputs(batch):
        return (batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"])

    step_fn = make_train_step(model, tx, qa_loss, model_inputs=model_inputs)

    rng = np.random.default_rng(args.seed)
    bs = args.per_device_train_batch_size
    steps, loss = 0, jnp.zeros(())
    done = False
    for epoch in range(args.num_train_epochs):
        order = rng.permutation(len(rows))
        for i in range(0, len(order), bs):
            take = [rows[j] for j in order[i:i + bs]]
            take = take + take[: bs - len(take)]  # pad-cycle the tail
            batch = {
                "input_ids": jnp.asarray([r["input_ids"] for r in take]),
                "attention_mask": jnp.asarray(
                    [r["attention_mask"] for r in take]),
                "token_type_ids": jnp.asarray(
                    [r["token_type_ids"] for r in take]),
                "start": jnp.asarray([r["start"] for r in take]),
                "end": jnp.asarray([r["end"] for r in take]),
            }
            state, loss = step_fn(state, batch)
            steps += 1
            if steps % 50 == 0:
                print(f"epoch {epoch} step {steps} loss {float(loss):.4f}",
                      flush=True)
            if args.max_steps and steps >= args.max_steps:
                done = True
                break
        if done:
            break

    os.makedirs(args.output_dir, exist_ok=True)
    save_checkpoint(os.path.abspath(
        os.path.join(args.output_dir, "checkpoint")), state)

    # Eval with the trained params (incl. LoRA deltas + frozen observers).
    eval_ex, references = load_squad(args.eval_json or args.squad_json)
    if args.max_examples:
        eval_ex = eval_ex[: args.max_examples]
        references = {e["id"]: references[e["id"]] for e in eval_ex}
    feats, eval_rows = featurize(eval_ex, tokenizer,
                                 max_len=args.max_seq_length)
    eval_vars = {"params": state.params}
    if state.quant_state:
        eval_vars["quant_state"] = state.quant_state
    fwd = jax.jit(lambda ids, mask, tt: model.apply(eval_vars, ids, mask, tt))

    all_start, all_end = [], []
    ebs = args.per_device_eval_batch_size
    for i in range(0, len(eval_rows), ebs):
        chunk = eval_rows[i:i + ebs]
        pad = ebs - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        start, end = fwd(
            jnp.asarray([r["input_ids"] for r in chunk]),
            jnp.asarray([r["attention_mask"] for r in chunk]),
            jnp.asarray([r["token_type_ids"] for r in chunk]))
        n = ebs - pad
        all_start.append(np.asarray(start)[:n])
        all_end.append(np.asarray(end)[:n])

    preds = postprocess_qa_predictions(
        eval_ex, feats, np.concatenate(all_start), np.concatenate(all_end))
    metrics = squad_em_f1(preds, references)
    print(json.dumps({**metrics, "steps": steps,
                      "final_loss": float(loss),
                      "checkpoint": os.path.join(args.output_dir,
                                                 "checkpoint")}))


if __name__ == "__main__":
    main()
