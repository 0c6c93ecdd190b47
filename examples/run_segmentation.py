"""ADE20k-style semantic segmentation with quantization.

TPU-native counterpart of the reference's segmentation driver (reference:
examples/semantic_segmentation/run_semantic_segmentation.py — SegFormer
fine-tuning on ADE20k with eager quantize()), cut down to what runs offline:
training on (image, label-map) batches from .npy files or synthetic data,
mean-IoU evaluation.

Usage:
  python examples/run_segmentation.py --activation posit8_1 \
      --weight posit8_1 --quantize_forward gemm,residual --max_steps 50
  python examples/run_segmentation.py --data_dir ade/ --eval_only
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from quantized_training_tpu.cli import add_qspec_args, quant_config_from_args
from quantized_training_tpu.models.segformer import (
    SegFormer, SegFormerConfig, mean_iou, segmentation_loss,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_size", default="tiny",
                        choices=["tiny", "b0"])
    parser.add_argument("--data_dir", default=None,
                        help="dir with images_*.npy / labels_*.npy pairs "
                             "(NHWC float images, int label maps)")
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--max_steps", type=int, default=50)
    parser.add_argument("--eval_only", action="store_true")
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    cfg = (SegFormerConfig.tiny() if args.model_size == "tiny"
           else SegFormerConfig.b0())
    model = SegFormer(cfg, qconfig)

    bs = args.per_device_train_batch_size
    rng = np.random.default_rng(args.seed)
    HW = args.image_size

    def batches():
        if not args.data_dir:
            while True:
                imgs = rng.standard_normal((bs, HW, HW, 3)).astype(np.float32)
                labels = rng.integers(0, cfg.num_classes, (bs, HW, HW))
                yield imgs, labels
        else:
            for f in sorted(glob.glob(os.path.join(args.data_dir,
                                                   "images_*.npy"))):
                imgs = np.load(f)
                labels = np.load(f.replace("images_", "labels_"))
                for i in range(0, len(imgs) - bs + 1, bs):
                    yield imgs[i:i + bs], labels[i:i + bs]

    imgs0, labels0 = next(batches())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(imgs0))

    if args.eval_only:
        logits = model.apply(variables, jnp.asarray(imgs0))
        preds = jnp.argmax(logits, axis=-1)
        miou = float(mean_iou(preds, jnp.asarray(labels0), cfg.num_classes))
        print(json.dumps({"mean_iou": miou, "n": int(len(imgs0))}))
        return

    # BatchNorm (fuse_bn) needs train=True + mutable batch_stats:
    # specialized step (same shape as the imagenet driver's).
    tx = optax.adamw(args.learning_rate)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def compute(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"], train=True, mutable=["batch_stats"])
            return segmentation_loss(logits, batch["labels"]), upd["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    steps, loss = 0, None
    for imgs, labels in batches():
        batch = {"images": jnp.asarray(imgs),
                 "labels": jnp.asarray(labels)}
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, batch)
        steps += 1
        if steps % 10 == 0:
            print(f"step {steps} loss {float(loss):.4f}", flush=True)
        if args.max_steps and steps >= args.max_steps:
            break

    print(json.dumps({"steps": steps, "final_loss": float(loss)}))


if __name__ == "__main__":
    main()
