"""LLM generation demo: load a local HF LLaMA/GPT-2 checkpoint, quantize
weights, serve with the (optionally KIVI-quantized) KV cache.

    python examples/generate_llm.py --model_path /path/to/llama \
        --prompt "The capital of France is" \
        --weight posit8_1 --kv_cache uint2 --max_new_tokens 64
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
from quantized_training_tpu.serving import KVCacheConfig, generate
from wikitext import load_model  # reuse the LLaMA checkpoint loader


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--prompt", default="Hello, world")
    parser.add_argument("--max_new_tokens", type=int, default=32)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top_k", type=int, default=None)
    parser.add_argument("--kv_cache", default=None,
                        choices=[None, "uint2", "uint4", "uint8",
                                 "int4", "int8"],
                        help="quantize the KV cache: uint2/uint4 (KIVI group-affine) or int8/int4 (per-token symmetric, TPU-fast)")
    parser.add_argument("--storage", default=None,
                        choices=[None, "posit8", "mx8", "w4a16", "w2a16",
                                 "w2x4", "w8a8"],
                        help="serve with packed weight storage: kernels are "
                             "converted offline and the bf16 weights never "
                             "reach the device (quantize/storage.py)")
    parser.add_argument("--storage_group", type=int, default=64)
    parser.add_argument("--awq", action="store_true",
                        help="activation-aware smoothing before packing: "
                             "per-layer migration-strength search on the "
                             "prompt as calibration data (quantize/smooth)")
    parser.add_argument("--gptq", action="store_true",
                        help="error-compensated weight rounding for "
                             "w4a16/w2a16 storage (quantize/gptq.py); "
                             "Hessians calibrate on the prompt")
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--prefill_len", type=int, default=128)
    add_qspec_args(parser)
    args = parser.parse_args()

    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.model_path)
    ids = tok(args.prompt, return_tensors="np").input_ids

    # pad prefill to the static prefill length
    P = args.prefill_len
    if ids.shape[1] > P:
        ids = ids[:, -P:]

    qconfig = quant_config_from_args(args)
    kcfg = None
    if args.kv_cache in ("int8", "int4"):
        # per-token symmetric int cache: the TPU-fast format (2.1x the
        # uint2 KIVI decode kernel, ~50x tighter quantization error)
        kcfg = KVCacheConfig.int_sym(
            P, args.max_new_tokens, bits=int(args.kv_cache[3:]))
    elif args.kv_cache:
        kcfg = KVCacheConfig.kivi(
            P, args.max_new_tokens,
            k_spec=f"{args.kv_cache},qs=group_wise_affine,bs=32,ax=-2",
            v_spec=f"{args.kv_cache},qs=group_wise_affine,bs=32,ax=-1",
        )

    model, params, cfg = load_model(args.model_path, qconfig,
                                    args.use_flash_attention)
    if kcfg is not None:
        from dataclasses import replace
        cfg = replace(cfg, kv_cache=kcfg)
        model = type(model)(cfg, qconfig)

    variables = {"params": params}
    if args.awq and args.storage in ("w4a16", "w2a16"):
        # activation-aware migration, searched against the storage format
        from quantized_training_tpu.quantize import (
            awq_search_llama, smooth_llama,
        )
        nbits = 4 if args.storage == "w4a16" else 2
        spec = (f"uint{nbits},qs=group_wise_affine,"
                f"bs={args.storage_group},ax=0")
        calib_model = type(model)(cfg, None)
        alphas, amax = awq_search_llama(
            calib_model, {"params": params}, jnp.asarray(ids),
            weight_spec=spec)
        params, _ = smooth_llama(params, amax, alphas)
        print(f"awq: alphas={alphas}", file=sys.stderr)

    if args.storage:
        from quantized_training_tpu.quantize import build_storage
        if args.gptq and args.storage in ("w4a16", "w2a16"):
            from quantized_training_tpu.quantize import (
                accumulate_gptq, build_storage_gptq,
            )
            calib_model = type(model)(cfg, None)
            _, col = calib_model.apply(
                {"params": params}, jnp.asarray(ids), mutable=["gptq"])
            hessians = accumulate_gptq(None, col["gptq"])
            storage, slim = build_storage_gptq(
                params, hessians, args.storage, args.storage_group)
        else:
            storage, slim = build_storage(params, args.storage,
                                          args.storage_group)
        variables = {"params": slim, "storage": storage}
        from quantized_training_tpu.quantize import QuantConfig
        qconfig = (qconfig if qconfig is not None
                   else QuantConfig()).with_storage(
            args.storage, args.storage_group)
        model = type(model)(cfg, qconfig)

    out = generate(
        model, variables, jnp.asarray(ids),
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        eos_token_id=tok.eos_token_id,
    )
    text = tok.decode(np.asarray(out[0]), skip_special_tokens=True)
    print(json.dumps({"text": text}))


if __name__ == "__main__":
    main()
