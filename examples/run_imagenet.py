"""ImageNet CNN training/eval with QAT + BN folding — the reference's
examples/imagenet/main.py capability on TPU (NHWC ResNets, eager-equivalent
QAT, BN folding for PTQ).

Offline-friendly: expects a directory of .npy batches or uses synthetic data
for smoke runs (--synthetic).  Distributed data parallelism comes from the
mesh: batches shard over the data axis (the reference's DDP plumbing is
replaced by jax.sharding).
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
from quantized_training_tpu.models.resnet import (
    ResNet, ResNetConfig, fold_batchnorm,
)
from quantized_training_tpu.training import TrainState, make_train_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="resnet18",
                        choices=["resnet18", "resnet50", "tiny"])
    parser.add_argument("--data_dir", default=None,
                        help="dir with images_*.npy / labels_*.npy batches")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--fold_bn", action="store_true",
                        help="fold BN stats into convs after training (PTQ)")
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    cfg = getattr(ResNetConfig, args.arch)()
    model = ResNet(cfg, qconfig)

    bs = args.per_device_train_batch_size
    rng = np.random.default_rng(args.seed)

    def batches():
        if args.synthetic or not args.data_dir:
            while True:
                yield (rng.standard_normal(
                           (bs, args.image_size, args.image_size, 3)
                       ).astype(np.float32),
                       rng.integers(0, cfg.num_classes, bs))
        else:
            import glob
            for f in sorted(glob.glob(os.path.join(args.data_dir,
                                                   "images_*.npy"))):
                imgs = np.load(f)
                labels = np.load(f.replace("images_", "labels_"))
                for i in range(0, len(imgs) - bs + 1, bs):
                    yield imgs[i:i + bs], labels[i:i + bs]

    example = next(batches())
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False)
    )(jax.random.PRNGKey(args.seed), jnp.asarray(example[0]))

    tx = optax.sgd(args.learning_rate, momentum=0.9)

    def loss_fn(outputs, batch):
        logp = jax.nn.log_softmax(outputs, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, batch["labels"][:, None], axis=-1))

    # BatchNorm needs train=True + mutable batch_stats: specialized step.
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def compute(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"], train=True, mutable=["batch_stats"])
            return loss_fn(out, batch), upd["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    steps = 0
    for imgs, labels in batches():
        batch = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, batch)
        steps += 1
        if steps % 20 == 0:
            print(f"step {steps} loss {float(loss):.4f}", flush=True)
        if args.max_steps and steps >= args.max_steps:
            break

    if args.fold_bn:
        params, batch_stats = fold_batchnorm(params, batch_stats)
        print("folded BN into conv weights for PTQ", file=sys.stderr)

    print(json.dumps({"steps": steps, "final_loss": float(loss)}))


if __name__ == "__main__":
    main()
