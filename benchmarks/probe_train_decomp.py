"""Train-step accounting: decompose the bf16 baseline and the bwd
error-quant delta (VERDICT r05 #5).

r04 left two holes: the bf16 denominator (109.1 ms, 0.557 MFU) was never
itself decomposed, and the +13.1 ms backward error-quant — the largest
quantization delta — got no per-site analysis.  This probe measures, at the
exact train-bench geometry (2048-hidden / 8-layer stack, batch 4 x seq
1024, 536M params):

  1. grad-only steps (no optimizer) for bf16 and posit8 fwd+err arms —
     the optimizer share falls out by subtraction against BENCH_TRAIN's
     full-step numbers;
  2. lm_head + softmax-xent loss fwd+bwd isolated (the vocab-32000 loss
     head is sized like 13% of model FLOPs but runs elementwise-heavy);
  3. one backward error-quant site in isolation at both cotangent shapes,
     against the bare posit8 rounding pass on the same tensor (the
     XLA-elementwise floor), x the enumerated site count -> predicted
     delta vs the measured +13.1 ms;
  4. the per-layer flash fwd+bwd (re-measured for the same-session table).

Prints one JSON line per measurement (-> BENCH_TRAINDECOMP_r05.json).
"""

import json
import os
import sys
import threading
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0

B, S = 4, 1024
HID, INTER, LAYERS, VOCAB = 2048, 5504, 8, 32000

SANITY = os.environ.get("QT_PROBE_SANITY") == "1"


def emit(rec):
    if SANITY:
        rec["sanity"] = True
    print(json.dumps(rec), flush=True)


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_train_decomp watchdog fired", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def timed_chain(step, operands, state0, n1=2, n2=8, repeats=4):
    @partial(jax.jit, static_argnames="n")
    def run(operands, state, n):
        def body(i, c):
            return step(operands, c)
        out = jax.lax.fori_loop(0, n, body, state)
        return sum(l.ravel()[0].astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(out))

    float(run(operands, state0, n1))
    float(run(operands, state0, n2))

    def t(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(operands, state0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n2, repeats) - t(n1, repeats)) / (n2 - n1)


def build(quantized, error=True):
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
    from quantized_training_tpu.quantize import QConfig, QuantConfig

    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HID, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=16,
        num_key_value_heads=16, max_position_embeddings=S,
        use_flash_attention=True,
    )
    qc = None
    if quantized:
        qc = QuantConfig(
            global_qconfig=QConfig.from_strs(
                activation="posit8_1", weight="posit8_1",
                error="posit8_1" if error else None,
            )
        ).with_fusion(forward="gemm", backward="gemm")
    return LlamaForCausalLM(cfg, qc), cfg


def probe_grad_only():
    """fwd+bwd (no optimizer) per step for the bf16 and fwd+err arms."""
    from quantized_training_tpu.training import causal_lm_loss
    out = {}
    for name, (q, e) in [("bf16", (False, False)),
                         ("posit8_fwderr", (True, True))]:
        model, cfg = build(q, e)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, VOCAB, (B, S)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        params = variables["params"]

        def loss_fn(p, ids_i):
            logits = model.apply({"params": p}, ids_i)
            return causal_lm_loss(logits, {"input_ids": ids_i})

        grad_fn = jax.grad(loss_fn)

        def step(params, c):
            ids_i, acc = c
            g = grad_fn(params, ids_i)
            g = jax.lax.optimization_barrier(g)
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(g))
            return (ids_i + 1) % VOCAB, acc + probe

        dt = timed_chain(step, params,
                         (ids, jnp.zeros((1,), jnp.float32)))
        out[name] = dt
        emit({"metric": f"traindecomp_gradonly_{name}_ms",
              "value": round(dt * 1e3, 2), "unit": "ms/step"})
        del variables, params
        jax.clear_caches()
    return out


def probe_lm_loss():
    """lm_head GEMM + softmax-xent fwd+bwd at (B*S, HID) -> VOCAB."""
    rng = np.random.default_rng(1)
    h0 = jnp.asarray(rng.normal(size=(B * S, HID)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(HID, VOCAB)) * 0.02, jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, VOCAB, (B * S,)))

    def loss_fn(h, w):
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return jnp.mean(lse - gold)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1))

    def step(ops, c):
        w, = ops
        h, acc = c
        gh, gw = grad_fn(h, w)
        gh, gw = jax.lax.optimization_barrier((gh, gw))
        return (h + (0.001 * gh).astype(h.dtype),
                acc + gw.ravel()[0].astype(jnp.float32)
                + gh.ravel()[0].astype(jnp.float32))

    dt = timed_chain(step, (w,), (h0, jnp.zeros((1,), jnp.float32)))
    flops = 3 * 2 * B * S * HID * VOCAB  # fwd + dh + dw GEMMs
    emit({"metric": "traindecomp_lm_loss_fwdbwd_ms",
          "value": round(dt * 1e3, 2), "unit": "ms",
          "gemm_flops_tflop": round(flops / 1e12, 2),
          "mfu_of_gemm_share": round(
              flops / dt / 1e12 / PEAK_BF16_TFLOPS, 3)})
    return dt


def probe_bwd_site():
    """One backward error-quant site vs the bare rounding pass (floor)."""
    from quantized_training_tpu.models.layers import bwd_quantize
    from quantized_training_tpu.numerics import quantize_fn
    from quantized_training_tpu.qspec import QuantizationSpec

    spec = QuantizationSpec.from_str("posit8_1")
    qfn = quantize_fn("posit8_1")
    out = {}
    for shape in [(B * S, HID), (B * S, INTER)]:
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

        # site cost: identity fwd, quantized cotangent in bwd — measured
        # through an actual grad with a DATA-DEPENDENT cotangent (a linear
        # loss makes the cotangent a constant, which XLA folds: the first
        # version measured 4865 GB/s on an 819 GB/s part)
        def f_site(x):
            y = bwd_quantize(x, spec)
            return 0.5 * jnp.sum(y.astype(jnp.float32) ** 2)

        g_site = jax.grad(f_site)

        def step_site(ops, c):
            x, acc = c
            g = g_site(x)
            return (x + (0.001 * g).astype(x.dtype),
                    acc + g.ravel()[0].astype(jnp.float32))

        dt_site = timed_chain(step_site, (),
                              (x0, jnp.zeros((1,), jnp.float32)),
                              n1=4, n2=64)

        def step_bare(ops, c):
            x, acc = c
            y = qfn(x)
            return (x + (0.001 * y).astype(x.dtype),
                    acc + y.ravel()[0].astype(jnp.float32))

        dt_bare = timed_chain(step_bare, (),
                              (x0, jnp.zeros((1,), jnp.float32)),
                              n1=4, n2=64)
        nbytes = int(np.prod(shape)) * 2 * 2  # bf16 read + write
        out[shape] = (dt_site, dt_bare)
        emit({
            "metric": f"traindecomp_bwd_site_{shape[1]}_us",
            "value": round(dt_site * 1e6, 1), "unit": "us",
            "bare_round_pass_us": round(dt_bare * 1e6, 1),
            "stream_gb_per_s_site": round(nbytes / dt_site / 1e9, 1),
            "stream_gb_per_s_bare": round(nbytes / dt_bare / 1e9, 1),
        })
    return out


def count_error_sites():
    """Enumerate backward error-quant sites at the bench config by tracing
    with a recording config proxy (same mechanism as the ladder golden
    test)."""
    from collections import Counter
    from quantized_training_tpu.models import LlamaForCausalLM
    from quantized_training_tpu.quantize import QConfig, QuantConfig

    model, cfg = build(True, True)
    inner = model.qconfig

    class Rec:
        def __init__(self, inner):
            self.inner = inner
            self.err_shapes = Counter()

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def error_spec(self, path, op, category, index=0):
            spec = self.inner.error_spec(path, op, category, index)
            if spec is not None:
                self.err_shapes[path.rsplit(".", 1)[-1]] += 1
            return spec

        def activation_spec(self, path, op, category, index=0):
            return self.inner.activation_spec(path, op, category, index)

        def weight_spec(self, path, op="linear"):
            return self.inner.weight_spec(path, op)

        def bias_spec(self, path, op="linear"):
            return self.inner.bias_spec(path, op)

    rec = Rec(inner)
    model2 = LlamaForCausalLM(model.config, rec)
    ids = jnp.zeros((B, S), jnp.int32)
    v = jax.eval_shape(model2.init, jax.random.PRNGKey(0), ids)
    rec.err_shapes.clear()  # count the apply trace only
    jax.eval_shape(lambda v, i: model2.apply(v, i), v, ids)
    return dict(rec.err_shapes)


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S",
                                               "2400")))
    sites = count_error_sites()
    emit({"metric": "traindecomp_error_sites", "value": sum(sites.values()),
          "unit": "count", "by_module": sites})

    only = os.environ.get("QT_TD_ONLY")
    if only == "site":
        site = probe_bwd_site()
        n_inter = sites.get("down_proj", 0)
        n_hid = sum(sites.values()) - n_inter
        pred = (n_hid * site[(B * S, HID)][0]
                + n_inter * site[(B * S, INTER)][0])
        emit({"metric": "traindecomp_bwd_quant_accounting",
              "value": round(pred * 1e3, 2), "unit": "ms_predicted",
              "sites_hid": n_hid, "sites_inter": n_inter})
        done.set()
        return

    grad = probe_grad_only()
    t_lm = probe_lm_loss()
    site = probe_bwd_site()

    # predicted bwd error-quant delta from per-site measurements: sites on
    # the INTER-wide cotangent are the down_proj inputs, the rest are
    # HID-wide (incl. lm_head)
    n_inter = sites.get("down_proj", 0)
    n_hid = sum(sites.values()) - n_inter
    pred = n_hid * site[(B * S, HID)][0] + n_inter * site[(B * S, INTER)][0]
    meas = (grad["posit8_fwderr"] - grad["bf16"])
    emit({
        "metric": "traindecomp_bwd_quant_accounting",
        "value": round(pred * 1e3, 2), "unit": "ms_predicted",
        "sites_hid": n_hid, "sites_inter": n_inter,
        "gradonly_delta_ms": round(meas * 1e3, 2),
        "note": "gradonly delta includes the forward fake-quant too; "
                "compare predicted bwd-site sum against BENCH_TRAIN's "
                "fwderr - fwd arm difference (+13.1 ms r04)",
    })
    done.set()


if __name__ == "__main__":
    main()
