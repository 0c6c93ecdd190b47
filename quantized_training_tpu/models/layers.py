"""Quantization-aware flax building blocks (the L3 model-integration layer).

Where the reference wraps nn.Modules with forward/backward hooks and swaps
them for QAT variants (reference: quantize.py:52-193,
modules/qat/linear.py:40-41), this framework builds quantization into the
modules themselves, driven by a static :class:`QuantConfig`:

  * ``FakeQuant`` — a linen module holding observer state in the
    ``quant_state`` collection.  The observer runs iff that collection is
    mutable in the current ``apply`` (calibration / QAT step), so
    freeze-after-calibrate is just dropping it from ``mutable=[...]``.
  * ``quant point helpers`` — ``qgemm_inputs``, ``qresidual_add``, ``qmul``,
    ``QLayerNorm``, ``QRMSNorm``, activation wrappers — each consults the
    QuantConfig with (module path, op, category, index), implementing the
    fusion ladder and all annotator scopes without graph surgery.
  * ``QDense`` / ``QConv`` / ``QLoRADense`` — QAT layers applying
    weight_fake_quant each step like the reference QAT modules.
  * ``bwd_quantize`` — gradient ("error") quantization as a custom_vjp.

Site naming matches the eager reference convention: the observer for input i
of module m is ``{path}.activation_pre_process.{i}`` (quantize.py:128-146).
"""

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..qspec import QScheme, QuantizationSpec
from ..quantize.config import OpCategory, QuantConfig
from ..quantize.fake_quant import FakeQuantState, fake_quantize, init_state
from ..numerics import quantize_fn

__all__ = [
    "FakeQuant",
    "QuantMixin",
    "QDense",
    "QLoRADense",
    "QConv",
    "QConvBn",
    "QLayerNorm",
    "QRMSNorm",
    "NoNorm",
    "bwd_quantize",
    "QSoftmax",
]

Dtype = Any


class FakeQuant(nn.Module):
    """Fake-quantize a tensor, carrying observer state in ``quant_state``.

    Observer updates happen iff the collection is mutable — i.e. the caller
    passed ``mutable=["quant_state"]`` (or is initializing).  This replaces
    the reference's observer_enabled / fake_quant_enabled toggles with the
    natural JAX idiom.
    """

    spec: Optional[QuantizationSpec]
    quantize: bool = True
    record_histogram: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        spec = self.spec
        if spec is None:
            return x

        if self.record_histogram:
            # Exponent histogram: 254 bins over floor(log2|x|) in [-126, 127]
            # (reference: fake_quantize.py:348-350); zeros excluded.
            hist = self.variable(
                "quant_histogram", "hist",
                lambda: jnp.zeros((254,), jnp.float32))
            if self.is_mutable_collection("quant_histogram"):
                from ..utils.histogram import exponent_histogram
                hist.value = hist.value + exponent_histogram(x)

        stateless = spec.qscheme in (
            None, QScheme.MICROSCALING, QScheme.GROUP_WISE_AFFINE
        )
        if stateless:
            y, _ = fake_quantize(x, spec, None, observe=False,
                                 quantize=self.quantize)
            return y

        state_var = self.variable(
            "quant_state", "state", init_state, spec, x.shape
        )
        observing = self.is_mutable_collection("quant_state")
        y, new_state = fake_quantize(
            x, spec, state_var.value, observe=observing, quantize=self.quantize
        )
        if observing and new_state is not None:
            state_var.value = new_state
        return y


def _site(module: nn.Module, hook: str, index: int) -> str:
    return f"{hook}.{index}"


class QuantMixin:
    """Mixin giving any linen module config-driven quantization points.

    Requires a ``qconfig: QuantConfig`` attribute (may be None for a float
    model).  All helpers are no-ops when the config resolves no spec, so the
    same model class serves float and quantized execution with identical
    parameter trees.
    """

    @property
    def _path_str(self) -> str:
        return ".".join(self.path)

    def _qconfig(self) -> Optional[QuantConfig]:
        return getattr(self, "qconfig", None)

    def quant_input(
        self,
        x: jax.Array,
        op: str,
        category: OpCategory,
        index: int = 0,
        hook: Optional[str] = None,
    ) -> jax.Array:
        """Quantize a forward input tensor (forward-pre-hook semantics),
        then (optionally) its gradient (backward-pre-hook semantics).

        Observer naming is ``{op}_pre_process_{index}`` by default; pass
        ``hook`` when one module hosts several sites of the same op kind.
        """
        cfg = self._qconfig()
        if cfg is None:
            return x
        hook = hook or f"{op}_pre_process"
        path = self._path_str
        spec = cfg.activation_spec(path, op, category, index)
        if spec is not None:
            x = FakeQuant(spec, record_histogram=cfg.record_histogram,
                          name=f"{hook}_{index}")(x)
        err = cfg.error_spec(path, op, category, index)
        if err is not None:
            x = bwd_quantize(x, err)
        return x

    def quant_gemm_inputs(
        self, *inputs: jax.Array, op: str = "linear"
    ) -> Tuple[jax.Array, ...]:
        return tuple(
            self.quant_input(x, op, OpCategory.GEMM, i)
            for i, x in enumerate(inputs)
        )

    def quant_residual(self, a: jax.Array, b: jax.Array,
                       hook: Optional[str] = None) -> jax.Array:
        """Residual add with both inputs quantized (AddFunctional).

        The sum is pinned to the model dtype: the reference's AddFunctional
        produces a real bf16 tensor, and XLA's excess-precision fusion would
        otherwise leak an f32 sum into downstream norm statistics /
        quantizers, making jit diverge from eager (bitutils
        .materialize_rounding)."""
        from ..numerics.bitutils import materialize_rounding
        a = self.quant_input(a, "add", OpCategory.RESIDUAL, 0, hook=hook)
        b = self.quant_input(b, "add", OpCategory.RESIDUAL, 1, hook=hook)
        return materialize_rounding(a + b)

    def quant_mul(self, a: jax.Array, b: jax.Array,
                  hook: Optional[str] = None) -> jax.Array:
        """Elementwise scaling with quantized inputs (MulFunctional); the
        product is pinned to the model dtype like quant_residual."""
        from ..numerics.bitutils import materialize_rounding
        a = self.quant_input(a, "mul", OpCategory.SCALING, 0, hook=hook)
        b = self.quant_input(b, "mul", OpCategory.SCALING, 1, hook=hook)
        return materialize_rounding(a * b)

    def quant_activation_input(self, x: jax.Array, op: str) -> jax.Array:
        return self.quant_input(x, op, OpCategory.ACTIVATION, 0)

    def quant_norm_input(self, x: jax.Array, op: str = "layer_norm") -> jax.Array:
        return self.quant_input(x, op, OpCategory.LAYERNORM, 0)

    def _shared_input_quant(self, x: jax.Array, children: Tuple[str, ...],
                            hook: str):
        """Quantize an input shared by several child dense layers once.

        Returns (quantized_x, True) when every child resolves the same
        direct-rounding spec with no error quantization (the rounded tensor
        is identical at each site, so one pass suffices); None otherwise —
        stateful schemes keep per-site observers, and per-branch gradient
        quantization must stay at each site because branch cotangents are
        quantized before they sum.
        """
        cfg = self._qconfig()
        if cfg is None:
            return None
        base = self._path_str
        specs, errs = [], []
        for child in children:
            path = f"{base}.{child}" if base else child
            specs.append(cfg.activation_spec(path, "linear", OpCategory.GEMM, 0))
            errs.append(cfg.error_spec(path, "linear", OpCategory.GEMM, 0))
        spec = specs[0]
        if (spec is None or any(s != spec for s in specs)
                or any(e is not None for e in errs)
                or spec.qscheme is not None
                or spec.outlier_threshold is not None):
            return None
        return FakeQuant(spec, record_histogram=cfg.record_histogram,
                         name=f"{hook}_0")(x), True

    def weight_fake_quant(self, w: jax.Array, op: str = "linear") -> jax.Array:
        cfg = self._qconfig()
        if cfg is None:
            return w
        spec = cfg.weight_spec(self._path_str, op)
        if spec is None:
            return w
        return FakeQuant(spec, record_histogram=cfg.record_histogram,
                         name="weight_fake_quant")(w)


def bwd_quantize(x: jax.Array, spec: QuantizationSpec) -> jax.Array:
    """Identity forward; fake-quantizes the cotangent in backward.

    This is the reference's error_pre_process hook (quantize.py:142-150).
    Design note: the reference keeps an amax *history* for gradients too;
    carrying mutable state out of a VJP is not expressible in JAX, so error
    quantization uses just-in-time scaling (amax of the current gradient
    tensor).  Scale quality is equal-or-better; the delayed-scaling variant
    existed to amortize the amax reduction, which XLA fuses for free here.
    """

    @jax.custom_vjp
    def _identity(t):
        return t

    def fwd(t):
        return t, None

    def bwd(_, g):
        gq, _ = fake_quantize(
            g, spec.replace(amax_history_len=1), None,
            observe=True, quantize=True,
        )
        return (gq,)

    _identity.defvjp(fwd, bwd)
    return _identity(x)


class QDense(nn.Module, QuantMixin):
    """Dense layer with QAT weight fake-quant + input activation quant.

    Equivalent of reference qat.Linear (modules/qat/linear.py:40-41) plus the
    forward-pre hook on nn.Linear (gemm category).  Kernel layout is
    (in_features, out_features) per flax convention; HF loaders transpose.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    # The caller already quantized this layer's input at a shared site
    # (e.g. one rounding for q/k/v projections of the same hidden state).
    skip_input_quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self._qconfig()
        if (cfg is not None and cfg.storage_fmt is not None
                and self.has_variable("storage", "codes")):
            # Deployed weight storage (quantize/storage.py): the kernel was
            # packed offline and removed from params; the storage matmul
            # dequantizes codes in VMEM, bit-equal to the corresponding
            # weight fake-quant.  No kernel param is declared at all.
            x = self._input_site(x, cfg)
            y = self._storage_matmul(x, cfg.storage_fmt, cfg.storage_group)
            if self.use_bias:
                bias = self.param(
                    "bias", self.bias_init, (self.features,),
                    self.param_dtype)
                y = y + self._maybe_quant_bias(bias).astype(self.dtype)
            return y

        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        kernel = kernel.astype(self.dtype)
        x = self._input_site(x, cfg)
        if self.is_mutable_collection("gptq") and not self.is_initializing():
            # GPTQ calibration (quantize/gptq.py): accumulate this layer's
            # input Hessian X^T X of the (post-input-quant) matmul operand.
            # Only runs when the caller asked for mutable=["gptq"]; the
            # is_initializing() guard matters because flax init makes every
            # collection mutable — without it each model.init would
            # materialize K x K Hessians per QDense (gigabytes at real
            # model sizes) and ship them inside `variables` forever.
            x2 = x.astype(jnp.float32).reshape(-1, x.shape[-1])
            k_in = x.shape[-1]
            self.sow("gptq", "hessian", x2.T @ x2,
                     reduce_fn=lambda a, b: a + b,
                     init_fn=lambda: jnp.zeros((k_in, k_in), jnp.float32))
        if cfg is not None and cfg.lora_matches(self._path_str):
            # QAT LoRA (reference modules/qat/lora.py:34-55): fake-quantize
            # A and B, then the merged weight, every step.
            rank = cfg.lora_rank
            lora_a = self.param(
                "lora_a", nn.initializers.normal(0.02),
                (x.shape[-1], rank), self.param_dtype).astype(self.dtype)
            lora_b = self.param(
                "lora_b", nn.initializers.zeros_init(),
                (rank, self.features), self.param_dtype).astype(self.dtype)
            wspec = cfg.weight_spec(self._path_str)
            if wspec is not None:
                lora_a = FakeQuant(wspec, name="lora_a_fake_quant")(lora_a)
                lora_b = FakeQuant(wspec, name="lora_b_fake_quant")(lora_b)
            kernel = kernel + (cfg.lora_alpha / rank) * (lora_a @ lora_b)

        kernel = self.weight_fake_quant(kernel)
        y = jnp.dot(x.astype(self.dtype), kernel,
                    preferred_element_type=jnp.float32)
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            bias = self._maybe_quant_bias(bias)
            y = y + bias.astype(self.dtype)
        return y


    def _input_site(self, x, cfg):
        """The linear GEMM input site.  skip_input_quant means the caller
        already applied this site's FORWARD rounding (shared qkv site, or a
        fused producer epilogue like flash out_qfn) — the value is already
        rounded, but the backward error tap is this layer's own and must
        still attach (dropping it with the forward quant silently
        de-quantized the o_proj input cotangent whenever the flash out-quant
        engaged)."""
        if not self.skip_input_quant:
            return self.quant_input(x, "linear", OpCategory.GEMM, 0)
        if cfg is not None:
            err = cfg.error_spec(
                self._path_str, "linear", OpCategory.GEMM, 0)
            if err is not None:
                x = bwd_quantize(x, err)
        return x

    def _storage_matmul(self, x: jax.Array, fmt: str,
                        group: int) -> jax.Array:
        """x @ dequant(packed codes) via the weight-storage kernels."""
        lead = x.shape[:-1]
        x2 = x.astype(self.dtype).reshape(-1, x.shape[-1])
        codes = self.get_variable("storage", "codes")
        if fmt == "posit8":
            from ..ops.pallas.posit_storage import posit_matmul
            y = posit_matmul(x2, codes)
        elif fmt == "mx8":
            # the SPMD-partitionable wrapper, not bare mx_matmul: under pjit
            # the opaque pallas custom call would force the Megatron-sharded
            # codes to all-gather; the custom_partitioning rule keeps them
            # sharded (column: per-shard GEMM, row: partials + one psum)
            from ..ops.pallas.mx_storage import mx_matmul_sharded
            scales = self.get_variable("storage", "scales")
            y = mx_matmul_sharded(x2, codes, scales, block_size=group)
        elif fmt == "w8a8":
            # native integer GEMM: dynamic per-token activation quant is
            # inside the op (no separate activation fake-quant at this site)
            from ..ops.int8_matmul import w8a8_matmul
            scale = self.get_variable("storage", "scales")
            y = w8a8_matmul(x2, codes, scale)
        else:
            from ..ops.pallas.affine_storage import affine_matmul
            # w2x4 stores w2 values in the w4 word layout (zp pre-shifted
            # at pack time), so it consumes the nbits=4 kernel unchanged
            nbits = 2 if fmt == "w2a16" else 4
            sf = self.get_variable("storage", "scales")
            zp = self.get_variable("storage", "zero_points")
            y = affine_matmul(x2, codes, sf, zp, nbits=nbits,
                              group_size=group)
        return y.astype(self.dtype).reshape(*lead, self.features)

    def _maybe_quant_bias(self, bias: jax.Array) -> jax.Array:
        """Derived-scale bias quantization: scale = act_scale * weight_scale
        (reference DerivedQuantizationSpec, quantize_pt2e.py:145-152).

        Applies only when the site has a bias spec and both the activation
        and weight observers use per-tensor delayed scaling (the schemes the
        derivation is defined for); scales are read from this layer's own
        observer states.
        """
        cfg = self._qconfig()
        if cfg is None:
            return bias
        bspec = cfg.bias_spec(self._path_str)
        if bspec is None:
            return bias
        aspec = cfg.activation_spec(
            self._path_str, "linear", OpCategory.GEMM, 0)
        wspec = cfg.weight_spec(self._path_str)

        def _scale_of(child, spec):
            if spec is None or spec.qscheme != QScheme.PER_TENSOR_SYMMETRIC:
                return None
            sub = self.get_variable("quant_state", child, None)
            if not sub:
                return None
            state = sub["state"] if isinstance(sub, dict) else sub
            return state.scale

        s_a = _scale_of("linear_pre_process_0", aspec)
        s_w = _scale_of("weight_fake_quant", wspec)
        if s_a is None or s_w is None:
            return bias
        scale = (s_a * s_w).astype(bias.dtype)
        from ..quantize.fake_quant import straight_through
        qfn = quantize_fn(bspec.dtype)
        return straight_through(lambda b: qfn(b / scale) * scale)(bias)


class QLoRADense(nn.Module, QuantMixin):
    """LoRA-adapted dense layer with QAT semantics matching the reference
    (modules/qat/lora.py:34-55): A and B are each fake-quantized with the
    weight quantizer, then the merged weight W + (alpha/r)·B@A is
    fake-quantized again before the matmul."""

    features: int
    lora_rank: int = 8
    lora_alpha: float = 16.0
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), self.param_dtype,
        ).astype(self.dtype)
        lora_a = self.param(
            "lora_a", nn.initializers.normal(0.02),
            (in_features, self.lora_rank), self.param_dtype,
        ).astype(self.dtype)
        lora_b = self.param(
            "lora_b", nn.initializers.zeros_init(),
            (self.lora_rank, self.features), self.param_dtype,
        ).astype(self.dtype)

        cfg = self._qconfig()
        wspec = cfg.weight_spec(self._path_str) if cfg else None
        if wspec is not None:
            lora_a = FakeQuant(wspec, name="lora_a_fake_quant")(lora_a)
            lora_b = FakeQuant(wspec, name="lora_b_fake_quant")(lora_b)
        scaling = self.lora_alpha / self.lora_rank
        merged = kernel + scaling * (lora_a @ lora_b)
        if wspec is not None:
            merged = FakeQuant(wspec, name="weight_fake_quant")(merged)

        x = self.quant_input(x, "linear", OpCategory.GEMM, 0)
        y = jnp.dot(x.astype(self.dtype), merged,
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class QConv(nn.Module, QuantMixin):
    """2D convolution with QAT weight fake-quant (reference qat.Conv2d,
    modules/qat/conv.py:43-45).  NHWC/HWIO layouts (TPU-native)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel_size
            + (x.shape[-1] // self.feature_group_count, self.features),
            self.param_dtype,
        ).astype(self.dtype)
        x = self.quant_input(x, "conv2d", OpCategory.GEMM, 0)
        kernel = self.weight_fake_quant(kernel, op="conv2d")
        # No preferred_element_type: the MXU accumulates in f32 regardless
        # and rounds once to the output dtype — identical numerics to an f32
        # result + astype, but with a transposable VJP (f32 cotangent vs
        # bf16 operands crashes conv's transpose rule).
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class QConvBn(nn.Module, QuantMixin):
    """Conv2d + BatchNorm QAT pair with in-training scaled-weight folding.

    The reference trains ConvBn modules whose *fake-quantized* weight is the
    BN-folded one (reference: modules/qat/conv_fused.py:25-363, the
    torch.ao approximate-folding scheme): each step scales the kernel by
    gamma / sqrt(running_var + eps), fake-quantizes THAT weight (what the
    deployed conv will actually carry), runs the conv, unscales, and applies
    train-mode BatchNorm with batch statistics.  At eval the running stats
    make the whole pair collapse to the folded conv, so quantization noise
    seen in training equals the deployed graph's.

    Use :func:`quantized_training_tpu.models.resnet.fold_batchnorm` (or
    :meth:`fold` here) to produce the deployment-time plain-conv params.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    feature_group_count: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.9
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        F = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel_size
            + (x.shape[-1] // self.feature_group_count, F),
            self.param_dtype,
        )
        gamma = self.param("scale", nn.initializers.ones_init(), (F,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros_init(), (F,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((F,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((F,), jnp.float32))

        # 1. fold the *running*-stat scale into the weight and quantize THAT
        #    (the tensor the deployed conv will carry)
        scale = gamma * jax.lax.rsqrt(ra_var.value + self.epsilon)   # (F,)
        w_scaled = (kernel * scale[None, None, None, :]).astype(self.dtype)
        w_scaled = self.weight_fake_quant(w_scaled, op="conv2d")

        x = self.quant_input(x, "conv2d", OpCategory.GEMM, 0)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_scaled,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        ).astype(jnp.float32)

        if train:
            # 2. undo the fold, then normalize with *batch* statistics
            #    (torch.ao _forward_approximate)
            y = y / scale[None, None, None, :]
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
            out = (y - mean) * jax.lax.rsqrt(var + self.epsilon)
            out = out * gamma + beta
        else:
            # eval: the running stats ARE the folded scale — only the bias
            # correction remains
            out = y + (beta - ra_mean.value * scale)[None, None, None, :]
        return out.astype(self.dtype)


class QLayerNorm(nn.Module, QuantMixin):
    """LayerNorm with a quantized input (layernorm category)."""

    epsilon: float = 1e-12
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.quant_norm_input(x, "layer_norm")
        dim = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones_init(), (dim,),
                               self.param_dtype)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (dim,),
                              self.param_dtype)
            y = y + bias
        return y.astype(self.dtype)


class QRMSNorm(nn.Module, QuantMixin):
    """RMSNorm (LLaMA) with a quantized input (layernorm category)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.quant_norm_input(x, "rms_norm")
        dim = x.shape[-1]
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones_init(), (dim,),
                           self.param_dtype)
        return (y * scale).astype(self.dtype)


class NoNorm(nn.Module, QuantMixin):
    """MobileBERT's NoNorm: elementwise scale+shift, no statistics
    (layernorm category for the fusion ladder)."""

    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.quant_norm_input(x, "layer_norm")
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (dim,),
                           self.param_dtype).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,),
                          self.param_dtype).astype(x.dtype)
        return x * scale + bias


class QSoftmax(nn.Module, QuantMixin):
    """Softmax with a quantized input (activation category).

    With ``posit_exp`` / ``posit_reciprocal`` set, exp and 1/sum are rounded
    through posit16_1 — the TPU-native equivalent of the reference's
    LUT-approximated softmax (modules/softmax.py:58-85): identical values,
    computed in-register instead of via gold-file tables.
    """

    posit_exp: bool = False
    posit_exp_shifted: bool = False
    posit_reciprocal: bool = False
    dtype: Dtype = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.quant_activation_input(x, "softmax")
        # module attrs OR the QuantConfig flags (the CLI's --posit_exp /
        # --posit_reciprocal arrive via the config so every model's
        # attention picks them up without per-model plumbing)
        cfg = self._qconfig()
        use_exp = bool(self.posit_exp or self.posit_exp_shifted or (
            cfg is not None and (cfg.posit_exp or cfg.posit_exp_shifted)))
        use_recip = bool(self.posit_reciprocal or (
            cfg is not None and cfg.posit_reciprocal))
        if use_exp or use_recip:
            from ..ops.softmax import posit_softmax

            out = posit_softmax(x, use_exp, use_recip)
            return out.astype(self.dtype)
        xf = x.astype(jnp.float32)
        x_max = jnp.max(xf, axis=-1, keepdims=True)
        shifted = xf - jax.lax.stop_gradient(x_max)
        e = jnp.exp(shifted)
        out = e / jnp.sum(e, axis=-1, keepdims=True)
        return out.astype(self.dtype)
