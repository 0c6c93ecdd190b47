"""Keyword-spotting training (Honk res8/res15) with QAT — the reference's
examples/audio_classification/honk_train.py capability.

Offline-friendly: trains on .npy spectrogram batches or synthetic data.
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
from quantized_training_tpu.models.kws import KWSConfig, KWSResNet
from quantized_training_tpu.training import (
    TrainState, classification_loss, make_train_step,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="res8", choices=["res8", "res15"])
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--max_steps", type=int, default=100)
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    cfg = KWSConfig.res8() if args.arch == "res8" else KWSConfig.res15()
    model = KWSResNet(cfg, qconfig)

    bs = args.per_device_train_batch_size
    rng = np.random.default_rng(args.seed)

    def batches():
        if not args.data_dir:
            while True:
                yield (rng.standard_normal((bs, 101, 40)).astype(np.float32),
                       rng.integers(0, cfg.n_labels, bs))
        else:
            import glob
            for f in sorted(glob.glob(os.path.join(args.data_dir,
                                                   "specs_*.npy"))):
                specs = np.load(f)
                labels = np.load(f.replace("specs_", "labels_"))
                for i in range(0, len(specs) - bs + 1, bs):
                    yield specs[i:i + bs], labels[i:i + bs]

    example = next(batches())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(example[0]))

    tx = optax.adam(args.learning_rate)
    state = TrainState.create(model, variables, tx)
    step_fn = make_train_step(
        model, tx, classification_loss,
        model_inputs=lambda b: (b["input_ids"],))

    steps = 0
    for specs, labels in batches():
        batch = {"input_ids": jnp.asarray(specs),
                 "labels": jnp.asarray(labels)}
        state, loss = step_fn(state, batch)
        steps += 1
        if steps % 20 == 0:
            print(f"step {steps} loss {float(loss):.4f}", flush=True)
        if args.max_steps and steps >= args.max_steps:
            break

    print(json.dumps({"steps": steps, "final_loss": float(loss)}))


if __name__ == "__main__":
    main()
