"""WikiText perplexity under quantization — the reference's headline LLM
benchmark (reference: examples/language_modeling/wikitext.py; protocol:
max_length 1024, stride 512 sliding window, bf16 model, README.md:96-106).

Usage (local checkpoint + local dataset file, no network):

    python examples/wikitext.py \
        --model_path /path/to/llama-2-7b   # HF dir with config.json + *.safetensors
        --data_file  /path/to/wiki.test.tokens \
        --activation posit8_1 --weight posit8_1 \
        --quantize_forward gemm            # "+ residual fusion" ladder rung

The fusion ladder sweep of the paper is --quantize_forward walking
{gemm,residual,layernorm,activation,scaling} down to {gemm}.
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
from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.models.gpt2 import (
    GPT2Config, GPT2LMHeadModel, convert_gpt2,
)
from quantized_training_tpu.models.hf_loader import (
    convert_llama, load_state_dict_dir,
)
from quantized_training_tpu.utils.evaluation import sliding_window_perplexity


def load_model(path: str, qconfig, use_flash: bool):
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if hf.get("model_type") == "gpt2":
        cfg = GPT2Config(
            vocab_size=hf["vocab_size"], n_positions=hf["n_positions"],
            n_embd=hf["n_embd"], n_layer=hf["n_layer"], n_head=hf["n_head"],
        )
        state = load_state_dict_dir(path)
        return GPT2LMHeadModel(cfg, qconfig), convert_gpt2(state, cfg.n_layer), cfg
    cfg = LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads"),
        max_position_embeddings=hf["max_position_embeddings"],
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        use_flash_attention=use_flash,
    )
    state = load_state_dict_dir(path)
    params = convert_llama(state, cfg.num_hidden_layers,
                           cfg.tie_word_embeddings)
    return LlamaForCausalLM(cfg, qconfig), params, cfg


def load_tokens(args) -> np.ndarray:
    if args.token_file:
        return np.load(args.token_file)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.model_path)
    if args.data_file:
        with open(args.data_file) as f:
            text = f.read()
    else:
        from datasets import load_dataset

        ds = load_dataset("wikitext", args.dataset_config, split="test")
        text = "\n\n".join(ds["text"])
    return np.asarray(tok(text, return_tensors="np").input_ids[0])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--data_file", type=str, default=None,
                        help="raw text file (e.g. wiki.test.tokens)")
    parser.add_argument("--token_file", type=str, default=None,
                        help="pre-tokenized .npy file of token ids")
    parser.add_argument("--dataset_config", type=str,
                        default="wikitext-103-raw-v1")
    parser.add_argument("--max_length", type=int, default=1024)
    parser.add_argument("--stride", type=int, default=512)
    parser.add_argument("--max_tokens", type=int, default=None,
                        help="truncate the eval stream (smoke runs)")
    add_qspec_args(parser)
    args = parser.parse_args()

    qconfig = quant_config_from_args(args)
    model, params, cfg = load_model(args.model_path, qconfig,
                                    args.use_flash_attention)
    tokens = load_tokens(args)
    if args.max_tokens:
        tokens = tokens[: args.max_tokens]
    n_layers = getattr(cfg, "num_hidden_layers", getattr(cfg, "n_layer", "?"))
    print(f"model: {args.model_path} ({n_layers} layers), "
          f"eval tokens: {len(tokens)}", file=sys.stderr)

    fwd = jax.jit(lambda ids: model.apply({"params": params}, ids))
    ppl = sliding_window_perplexity(
        fwd, tokens, max_length=args.max_length, stride=args.stride)
    print(json.dumps({
        "perplexity": round(ppl, 4),
        "activation": args.activation,
        "weight": args.weight,
        "quantize_forward": args.quantize_forward,
        "max_length": args.max_length,
        "stride": args.stride,
    }))


if __name__ == "__main__":
    main()
