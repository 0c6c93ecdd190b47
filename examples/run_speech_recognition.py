"""Whisper ASR fine-tuning / evaluation with quantization.

TPU-native counterpart of the reference's seq2seq speech-recognition driver
(reference: examples/speech_recognition/run_speech_recognition_seq2seq.py:
1-629 — Whisper fine-tuning with eager quantize() and label-shifted CE), cut
down to what runs offline: training on (log-mel features, token ids) batches
from .npy files or synthetic data, greedy transcription, and WER.

Usage:
  python examples/run_speech_recognition.py --activation posit8_1 \
      --weight posit8_1 --quantize_forward gemm --max_steps 50
  python examples/run_speech_recognition.py --data_dir feats/ --eval_only
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
from quantized_training_tpu.models.whisper import (
    WhisperConfig, WhisperForConditionalGeneration,
)
from quantized_training_tpu.training import TrainState, make_train_step


def seq2seq_loss(logits, batch):
    """Label-shifted CE over decoder targets; -100 labels masked (reference
    driver uses the HF seq2seq loss with -100 padding)."""
    labels = batch["labels"]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def greedy_transcribe(model, variables, features, bos_id, eos_id,
                      max_len=32):
    """Greedy decoder loop (no KV cache — eval sizes are small)."""
    B = features.shape[0]
    ids = np.full((B, 1), bos_id, np.int32)
    for _ in range(max_len - 1):
        logits = model.apply(variables, jnp.asarray(features),
                             jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))[:, None]
        ids = np.concatenate([ids, nxt.astype(np.int32)], axis=1)
        if (ids == eos_id).any(axis=1).all():
            break
    return ids


def wer(ref_tokens, hyp_tokens) -> float:
    """Word (token) error rate via edit distance."""
    import numpy as _np

    d = _np.zeros((len(ref_tokens) + 1, len(hyp_tokens) + 1), _np.int32)
    d[:, 0] = _np.arange(len(ref_tokens) + 1)
    d[0, :] = _np.arange(len(hyp_tokens) + 1)
    for i in range(1, len(ref_tokens) + 1):
        for j in range(1, len(hyp_tokens) + 1):
            sub = d[i - 1, j - 1] + (ref_tokens[i - 1] != hyp_tokens[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    return float(d[-1, -1]) / max(len(ref_tokens), 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_size", default="tiny",
                        choices=["tiny", "base"])
    parser.add_argument("--data_dir", default=None,
                        help="dir with feats_*.npy / tokens_*.npy pairs")
    parser.add_argument("--max_steps", type=int, default=50)
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument("--bos_id", type=int, default=1)
    parser.add_argument("--eos_id", type=int, default=2)
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    if args.model_size == "tiny":
        cfg = WhisperConfig.tiny(num_mel_bins=80, max_source_positions=128,
                                 vocab_size=1024)
    else:
        cfg = WhisperConfig()
    model = WhisperForConditionalGeneration(cfg, qconfig)

    bs = args.per_device_train_batch_size
    rng = np.random.default_rng(args.seed)
    T, S = 2 * cfg.max_source_positions, 16

    def batches():
        if not args.data_dir:
            while True:
                feats = rng.standard_normal(
                    (bs, cfg.num_mel_bins, T)).astype(np.float32)
                toks = rng.integers(3, cfg.vocab_size, (bs, S))
                yield feats, toks
        else:
            import glob
            # raw waveforms (audio_*.npy, float PCM at 16 kHz) go through
            # the jnp log-mel frontend; precomputed features (feats_*.npy)
            # are consumed as-is
            from quantized_training_tpu.data.audio import log_mel_spectrogram
            raw = sorted(glob.glob(os.path.join(args.data_dir,
                                                "audio_*.npy")))
            for f in raw:
                wav = np.load(f)
                feats = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
                # crop/pad time axis to the encoder's expected T
                feats = feats[..., :T] if feats.shape[-1] >= T else np.pad(
                    feats, ((0, 0), (0, 0), (0, T - feats.shape[-1])))
                toks = np.load(f.replace("audio_", "tokens_"))
                for i in range(0, len(feats) - bs + 1, bs):
                    yield feats[i:i + bs], toks[i:i + bs]
            for f in sorted(glob.glob(os.path.join(args.data_dir,
                                                   "feats_*.npy"))):
                feats = np.load(f)
                toks = np.load(f.replace("feats_", "tokens_"))
                for i in range(0, len(feats) - bs + 1, bs):
                    yield feats[i:i + bs], toks[i:i + bs]

    feats0, toks0 = next(batches())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(feats0),
        jnp.asarray(toks0))

    if args.eval_only:
        hyps = greedy_transcribe(model, variables, feats0, args.bos_id,
                                 args.eos_id)
        rates = [wer(list(map(int, r)), list(map(int, h[1:])))
                 for r, h in zip(toks0, hyps)]
        print(json.dumps({"wer": float(np.mean(rates)),
                          "n": len(rates)}))
        return

    tx = optax.adamw(args.learning_rate)
    state = TrainState.create(model, variables, tx)
    step_fn = make_train_step(
        model, tx, seq2seq_loss,
        model_inputs=lambda b: (b["input_features"],
                                b["decoder_input_ids"]))

    steps, loss = 0, None
    for feats, toks in batches():
        # teacher forcing: decoder sees BOS + tokens[:-1], predicts tokens
        dec_in = np.concatenate(
            [np.full((toks.shape[0], 1), args.bos_id, toks.dtype),
             toks[:, :-1]], axis=1)
        batch = {
            "input_features": jnp.asarray(feats),
            "decoder_input_ids": jnp.asarray(dec_in),
            "labels": jnp.asarray(toks),
        }
        state, loss = step_fn(state, batch)
        steps += 1
        if steps % 10 == 0:
            print(f"step {steps} loss {float(loss):.4f}", flush=True)
        if args.max_steps and steps >= args.max_steps:
            break

    print(json.dumps({"steps": steps, "final_loss": float(loss)}))


if __name__ == "__main__":
    main()
