"""Activation smoothing (SmoothQuant-style) for PTQ.

Activation tensors carry per-channel outliers that per-tensor quantization
clips or drowns; weights are comparatively flat.  Smoothing migrates the
difficulty: divide each activation channel by ``s_j`` and fold ``s_j`` into
the rows of every kernel that consumes it —

    y = act(x) @ W  ==  (act(x) / s) @ (diag(s) W)

which is *exact* in full precision, and after it the activation quantizes
with far less error while the weights (now scaled) remain easy.  Public
technique (SmoothQuant, Xiao et al. 2022); composes with this framework's
int8/W8A8 activation paths and the microscaling weight formats.

LLaMA placement: the activations feeding q/k/v and gate/up are RMSNorm
outputs ``(x / rms) * g``, so dividing by ``s`` folds into the norm's gain
``g / s`` — no runtime op is added at all.  This exact fold needs pre-LN
architectures (the norm output feeds ONLY the projections); in post-LN
encoders (BERT family) the norm output also rides the residual stream, so
folding would change the model — there SmoothQuant needs explicit mul ops,
which this framework expresses as a per-channel outlier spec instead
(qspec ``outlier=...``).  The classic

    s_j = amax_act_j ** alpha / amax_w_j ** (1 - alpha)

balance (alpha = 0.5 default) comes from per-channel calibration amaxes;
``calibrate_llama_amax`` collects them with flax ``capture_intermediates``
(no graph surgery).
"""

from typing import Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["smoothing_scales", "smooth_llama", "calibrate_llama_amax",
           "awq_search_llama"]


def smoothing_scales(act_amax: jax.Array, w_amax: jax.Array,
                     alpha: float = 0.5) -> jax.Array:
    """Per-channel migration scales; clamped so dead channels stay put."""
    act = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 1e-5)
    w = jnp.maximum(jnp.asarray(w_amax, jnp.float32), 1e-5)
    s = act ** alpha / w ** (1.0 - alpha)
    return jnp.clip(s, 1e-3, 1e3)


def calibrate_llama_amax(model, variables, batches) -> Dict[str, jax.Array]:
    """Per-channel amax of each decoder layer's two norm outputs.

    Returns {"layers_i.attn": (d,), "layers_i.mlp": (d,)} — the activations
    feeding q/k/v and gate/up respectively.  ``batches`` is an iterable of
    input_ids arrays.
    """
    def keep(mdl, method_name):
        return getattr(mdl, "name", None) in (
            "input_layernorm", "post_attention_layernorm")

    amax: Dict[str, jax.Array] = {}
    for ids in batches:
        _, state = model.apply(
            variables, ids, capture_intermediates=keep,
            mutable=["intermediates"])
        inter = state["intermediates"]["model"]
        for lname, sub in inter.items():
            if not lname.startswith("layers_"):
                continue
            for norm, key in (("input_layernorm", "attn"),
                              ("post_attention_layernorm", "mlp")):
                y = sub[norm]["__call__"][0]
                a = jnp.max(jnp.abs(y.astype(jnp.float32)),
                            axis=tuple(range(y.ndim - 1)))
                k = f"{lname}.{key}"
                amax[k] = jnp.maximum(amax[k], a) if k in amax else a
    return amax


def smooth_llama(params, act_amax: Dict[str, jax.Array],
                 alpha: Union[float, Dict[str, float]] = 0.5):
    """Fold smoothing scales into a LlamaForCausalLM params tree.

    For every decoder layer: ``input_layernorm.scale /= s_attn`` with
    ``s_attn`` multiplied into the q/k/v kernel rows, and
    ``post_attention_layernorm.scale /= s_mlp`` into gate/up rows.  The fp
    forward is unchanged (exact linear identity, tested); per-tensor
    activation quantization error drops on outlier-heavy channels.
    ``alpha`` may be a single migration strength or a per-site dict
    (``{"layers_i.attn": a, ...}``, e.g. from :func:`awq_search_llama`).
    Returns (smoothed_params, scales_dict).
    """
    def _alpha(key):
        return alpha.get(key, 0.5) if isinstance(alpha, dict) else alpha
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    model = dict(params["model"])
    scales = {}
    for lname in list(model.keys()):
        if not lname.startswith("layers_"):
            continue
        layer = dict(model[lname])
        attn = dict(layer["self_attn"])
        mlp = dict(layer["mlp"])

        # attention side
        k = f"{lname}.attn"
        if k in act_amax:
            w_amax = jnp.maximum(
                jnp.max(jnp.abs(attn["q_proj"]["kernel"]), axis=1),
                jnp.maximum(
                    jnp.max(jnp.abs(attn["k_proj"]["kernel"]), axis=1),
                    jnp.max(jnp.abs(attn["v_proj"]["kernel"]), axis=1)))
            s = smoothing_scales(act_amax[k], w_amax, _alpha(k))
            scales[k] = s
            norm = dict(layer["input_layernorm"])
            norm["scale"] = (norm["scale"] / s).astype(norm["scale"].dtype)
            layer["input_layernorm"] = norm
            for proj in ("q_proj", "k_proj", "v_proj"):
                d = dict(attn[proj])
                d["kernel"] = (d["kernel"] * s[:, None]).astype(
                    d["kernel"].dtype)
                attn[proj] = d

        # mlp side
        k = f"{lname}.mlp"
        if k in act_amax:
            w_amax = jnp.maximum(
                jnp.max(jnp.abs(mlp["gate_proj"]["kernel"]), axis=1),
                jnp.max(jnp.abs(mlp["up_proj"]["kernel"]), axis=1))
            s = smoothing_scales(act_amax[k], w_amax, _alpha(k))
            scales[k] = s
            norm = dict(layer["post_attention_layernorm"])
            norm["scale"] = (norm["scale"] / s).astype(norm["scale"].dtype)
            layer["post_attention_layernorm"] = norm
            for proj in ("gate_proj", "up_proj"):
                d = dict(mlp[proj])
                d["kernel"] = (d["kernel"] * s[:, None]).astype(
                    d["kernel"].dtype)
                mlp[proj] = d

        layer["self_attn"] = attn
        layer["mlp"] = mlp
        model[lname] = layer
    out = dict(params)
    out["model"] = model
    return out, scales


def awq_search_llama(
    model, variables, batch,
    weight_spec: str = "uint4,qs=group_wise_affine,bs=64,ax=0",
    alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
) -> Tuple[Dict[str, float], Dict[str, jax.Array]]:
    """AWQ-style activation-aware migration search (Lin et al., 2023).

    SmoothQuant fixes one migration strength; AWQ's observation is that the
    right strength is *per layer* and should be chosen by the quantized
    layer's actual output error.  For each decoder layer's two projection
    groups this grid-searches ``alpha`` minimizing

        || (X / s) @ Q(diag(s) W)  -  X @ W ||_F,   s = a_act^alpha / a_w^(1-alpha)

    summed over the group's kernels, where ``Q`` is the *target weight
    format's* fake-quant (default: the w4a16 storage format's spec, so the
    search optimizes exactly what ``build_storage`` will ship).  ``X`` is
    the captured norm output on one calibration batch.

    Returns ``(alphas_dict, act_amax_dict)`` — feed both to
    :func:`smooth_llama`, then ``build_storage`` the smoothed params.
    """
    from ..qspec import QuantizationSpec
    from .fake_quant import fake_quantize

    spec = QuantizationSpec.from_str(weight_spec)

    def keep(mdl, method_name):
        return getattr(mdl, "name", None) in (
            "input_layernorm", "post_attention_layernorm")

    _, state = model.apply(
        variables, batch, capture_intermediates=keep,
        mutable=["intermediates"])
    inter = state["intermediates"]["model"]
    params = variables["params"]["model"]

    GROUPS = {
        "attn": ("input_layernorm", "self_attn",
                 ("q_proj", "k_proj", "v_proj")),
        "mlp": ("post_attention_layernorm", "mlp",
                ("gate_proj", "up_proj")),
    }

    best: Dict[str, float] = {}
    amaxes: Dict[str, jax.Array] = {}
    for lname, sub in inter.items():
        if not lname.startswith("layers_"):
            continue
        for key, (norm, block, projs) in GROUPS.items():
            X = sub[norm]["__call__"][0]
            X = X.astype(jnp.float32).reshape(-1, X.shape[-1])
            act_amax = jnp.max(jnp.abs(X), axis=0)
            kernels = [params[lname][block][p]["kernel"].astype(jnp.float32)
                       for p in projs]
            w_amax = jnp.max(jnp.abs(jnp.concatenate(kernels, axis=1)),
                             axis=1)
            ref = [X @ w for w in kernels]

            errs = []
            for a in alphas:
                s = smoothing_scales(act_amax, w_amax, a)
                Xs = X / s[None, :]
                e = 0.0
                for w, r in zip(kernels, ref):
                    wq, _ = fake_quantize(w * s[:, None], spec, None,
                                          observe=False)
                    e = e + jnp.sum((Xs @ wq - r) ** 2)
                errs.append(float(e))
            k = f"{lname}.{key}"
            best[k] = float(alphas[int(np.argmin(errs))])
            amaxes[k] = act_amax
    return best, amaxes
