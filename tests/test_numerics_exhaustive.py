"""Exhaustive bit-exactness tests: every quantizer is checked on ALL 2**16
bf16 values against the reference framework's implementation (the reference's
own LUT-enumeration trick, reference: posit.py:69-75, fp8.py:70-82,
fake_quantize.py:31-95 — reused here as the correctness specification)."""

import numpy as np
import pytest

import jax.numpy as jnp
import ml_dtypes

from quantized_training_tpu.numerics import (
    bf16_universe,
    get_quantization_map,
    quantize_fn,
    apply_lut,
)

from reference_oracle import load_oracle

ORACLE = load_oracle()

needs_oracle = pytest.mark.skipif(
    ORACLE is None, reason="reference checkout or torch unavailable"
)


def to_numpy_bf16(t):
    """torch bf16 tensor -> numpy (as float32 bit pattern comparable)."""
    return t.view(ORACLE.torch.int16).numpy()


def jnp_bf16_bits(x):
    return np.asarray(x).view(np.uint16).astype(np.int16)


def assert_bf16_bitwise_equal(ours, ref_torch, label, allow_nan=True):
    ours_bits = np.asarray(ours).view(np.uint16)
    ref_bits = ref_torch.view(ORACLE.torch.int16).numpy().view(np.uint16)

    if allow_nan:
        ours_f = np.asarray(ours).astype(np.float32)
        ref_f = ref_torch.float().numpy()
        both_nan = np.isnan(ours_f) & np.isnan(ref_f)
    else:
        both_nan = np.zeros(ours_bits.shape, dtype=bool)

    # Treat +0 and -0 as equal iff bit patterns differ only in sign of zero?
    # No: we demand exact bits except NaN payloads.
    mismatch = (ours_bits != ref_bits) & ~both_nan
    if mismatch.any():
        idx = np.nonzero(mismatch)[0][:10]
        inputs = np.arange(2 ** 16, dtype=np.uint16).view(ml_dtypes.bfloat16)
        msg = [f"{label}: {mismatch.sum()} mismatches / 65536"]
        for i in idx:
            msg.append(
                f"  input={float(inputs[i]):.6g} (bits {i:#06x}) "
                f"ours={np.asarray(ours).astype(np.float32)[i]:.6g} "
                f"ref={ref_torch.float().numpy()[i]:.6g}"
            )
        pytest.fail("\n".join(msg))


@needs_oracle
@pytest.mark.parametrize(
    "nbits,es", [(8, 1), (8, 2), (8, 0), (16, 1), (6, 1), (4, 1)]
)
def test_posit_exhaustive(nbits, es):
    from quantized_training_tpu.numerics import quantize_to_posit

    universe = bf16_universe()
    ours = quantize_to_posit(universe, nbits, es, round_to_even=True)

    ref = ORACLE.posit.quantize_to_posit(
        ORACLE.bf16_universe(), nbits, es, round_to_even=True
    )
    assert_bf16_bitwise_equal(ours, ref, f"posit{nbits}_{es}")


@needs_oracle
@pytest.mark.parametrize("fmt", ["e4m3", "e5m2"])
def test_fp8_exhaustive(fmt):
    from quantized_training_tpu.numerics import (
        quantize_to_fp8_e4m3,
        quantize_to_fp8_e5m2,
    )

    universe = bf16_universe()
    if fmt == "e4m3":
        ours = quantize_to_fp8_e4m3(universe)
        ref = ORACLE.fp8.quantize_to_fp8_e4m3(ORACLE.bf16_universe())
    else:
        ours = quantize_to_fp8_e5m2(universe)
        ref = ORACLE.fp8.quantize_to_fp8_e5m2(ORACLE.bf16_universe())
    assert_bf16_bitwise_equal(ours, ref, fmt)


@needs_oracle
@pytest.mark.parametrize(
    "dtype",
    ["fp8_e4m3", "fp8_e5m2", "fp6_e3m2", "fp6_e2m3", "fp4_e2m1", "fp8_e5m3"],
)
def test_fp_generic_exhaustive(dtype):
    """Generic fpN_eXmY quantizer vs the reference's microscaling-derived
    element-wise quantizer, run in bf16 exactly like the reference LUT."""
    import re

    universe = bf16_universe()
    ours = quantize_fn(dtype)(universe)

    torch = ORACLE.torch
    values = ORACLE.bf16_universe()
    nbits, ebits, mbits = map(
        int, re.fullmatch(r"fp(\d+)_e(\d+)m(\d+)", dtype).groups()
    )
    if nbits == ebits + mbits:
        values = torch.abs(values)
    mbits_full = mbits + 2
    emax = 2 ** (ebits - 1) - 1 if ebits > 4 else 2 ** (ebits - 1)
    if dtype != "fp8_e4m3":
        max_norm = 2 ** emax * float(2 ** (mbits_full - 1) - 1) / 2 ** (mbits_full - 2)
    else:
        max_norm = 2 ** emax * 1.75
    ref = ORACLE.fp8._quantize_elemwise_core(
        values, mbits_full, ebits, max_norm, round="even", saturate_normals=True
    )
    assert_bf16_bitwise_equal(ours, ref, dtype)


@needs_oracle
@pytest.mark.parametrize("dtype", ["int4", "int8", "uint4", "uint8", "int6"])
def test_int_exhaustive(dtype):
    import re

    universe = bf16_universe()
    ours = quantize_fn(dtype)(universe)

    torch = ORACLE.torch
    values = ORACLE.bf16_universe()
    m = re.fullmatch(r"(u?)int(\d+)", dtype)
    nbits = int(m.group(2))
    if m.group(1):
        qmin, qmax = 0, 2 ** nbits - 1
    else:
        qmin, qmax = -(2 ** (nbits - 1)), 2 ** (nbits - 1) - 1
    ref = torch.clamp(torch.round(values), qmin, qmax)
    assert_bf16_bitwise_equal(ours, ref, dtype)


@needs_oracle
@pytest.mark.parametrize("dtype", ["nf4", "nf4_8", "nf2"])
def test_nf_exhaustive(dtype):
    import re

    universe = bf16_universe()
    indices, codebook = get_quantization_map(dtype)

    torch = ORACLE.torch
    values = ORACLE.bf16_universe()
    m = re.fullmatch(r"nf(\d+)(?:_(\d+))?", dtype)
    k = int(m.group(1))
    int_bits = int(m.group(2)) if m.group(2) else None
    ref_idx, ref_vals = ORACLE.nf.quantize_to_nf(values, k, int_bits=int_bits)

    np.testing.assert_array_equal(
        np.asarray(codebook.astype(jnp.float32)),
        ref_vals.float().numpy(),
        err_msg=f"{dtype} codebook",
    )
    # Dequantized values must agree (indices may differ only on exact ties).
    ours_deq = np.asarray(codebook[indices].astype(jnp.float32))
    ref_deq = ref_vals[ref_idx].float().numpy()
    np.testing.assert_array_equal(ours_deq, ref_deq, err_msg=f"{dtype} values")


@pytest.mark.parametrize("nbits,es", [(8, 1), (8, 2), (8, 0), (16, 1), (6, 1)])
def test_posit_unit_kernel_exhaustive(nbits, es):
    """quantize_to_posit_unit == quantize_to_posit_positive on every bf16 in
    [0, 1] (its declared domain — softmax probabilities)."""
    from quantized_training_tpu.numerics import (
        quantize_to_posit_positive, quantize_to_posit_unit,
    )

    universe = bf16_universe()
    vals = np.asarray(universe.astype(jnp.float32))
    in_unit = (vals >= 0.0) & (vals <= 1.0)

    full = np.asarray(
        quantize_to_posit_positive(universe, nbits, es).astype(jnp.float32))
    unit = np.asarray(
        quantize_to_posit_unit(universe, nbits, es).astype(jnp.float32))
    np.testing.assert_array_equal(
        unit[in_unit], full[in_unit], err_msg=f"posit{nbits}_{es} unit")


def test_lut_consistency_posit():
    """Direct quantizer == LUT gather on random f32 inputs (sticky-bit key)."""
    from quantized_training_tpu.numerics import quantize_to_posit

    qmap = get_quantization_map("posit8_1")
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(4096).astype(np.float32) * 10.0, dtype=jnp.bfloat16
    )
    direct = quantize_to_posit(x, 8, 1)
    via_lut = apply_lut(x, qmap)
    np.testing.assert_array_equal(
        np.asarray(direct.astype(jnp.float32)),
        np.asarray(via_lut.astype(jnp.float32)),
    )


def test_lut_sticky_key_avoids_double_rounding():
    """apply_lut on f32 input (round-to-odd key) == direct RNE from f32 —
    the property the reference's sticky-bit trick exists for."""
    from quantized_training_tpu.numerics import quantize_to_posit

    qmap = get_quantization_map("posit8_1")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(100000).astype(np.float32) * 50.0)
    via_lut = apply_lut(x, qmap)
    direct = quantize_to_posit(x, 8, 1)
    np.testing.assert_array_equal(
        np.asarray(via_lut.astype(jnp.float32)), np.asarray(direct)
    )


def test_lut_native_dtypes():
    qmap = get_quantization_map("bfloat16")
    universe = bf16_universe()
    nan_mask = np.isnan(np.asarray(universe, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(qmap)[~nan_mask], np.asarray(universe)[~nan_mask]
    )


def test_posit_golden_values():
    """Spot-check posit8_1 against hand-computed values (works without the
    reference checkout)."""
    from quantized_training_tpu.numerics import quantize_to_posit

    x = jnp.asarray(
        [1.0, 1.1, 1.5, 2.0, 3.0, 0.0, -1.0, 4096.0, 1e9, 1e-9, 0.04],
        dtype=jnp.float32,
    )
    y = np.asarray(quantize_to_posit(x, 8, 1).astype(jnp.float32))
    # posit8_1: useed=4, maxpos=4^6=4096, minpos=4^-6
    expected = np.array(
        [1.0, 1.125, 1.5, 2.0, 3.0, 0.0, -1.0, 4096.0, 4096.0, 0.0, 0.0390625],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(y, expected)


def test_fp8_golden_values():
    from quantized_training_tpu.numerics import quantize_to_fp8_e4m3

    x = jnp.asarray([448.0, 500.0, 1.0, 0.0625, 2.0 ** -9, 1e-12], dtype=jnp.float32)
    y = np.asarray(quantize_to_fp8_e4m3(x).astype(jnp.float32))
    expected = np.array([448.0, 448.0, 1.0, 0.0625, 2.0 ** -9, 0.0], dtype=np.float32)
    np.testing.assert_array_equal(y, expected)


@pytest.mark.parametrize("nbits,es", [(8, 1), (8, 2), (8, 0), (16, 1), (6, 1),
                                      (12, 2), (4, 1)])
def test_posit_unit_mul_kernel_exhaustive(nbits, es):
    """quantize_to_posit_unit_mul (the multiplication-form production kernel
    for in-flash p-quant) == quantize_to_posit on every bf16 in [0, 1]."""
    from quantized_training_tpu.numerics import quantize_to_posit
    from quantized_training_tpu.numerics.posit import (
        quantize_to_posit_unit_mul,
    )

    universe = bf16_universe()
    vals = np.asarray(universe.astype(jnp.float32))
    in_unit = (vals >= 0.0) & (vals <= 1.0)

    ref = np.asarray(
        quantize_to_posit(universe, nbits, es).astype(jnp.float32))
    mul = np.asarray(
        quantize_to_posit_unit_mul(universe, nbits, es).astype(jnp.float32))
    np.testing.assert_array_equal(
        mul[in_unit], ref[in_unit], err_msg=f"posit{nbits}_{es} unit_mul")


def test_posit_unit_mul_f32_probes():
    """The mul kernel must also agree with the bit-integer unit kernel at
    full f32 granularity (the flash kernel quantizes f32 running probs):
    dense random probes plus every rounding-boundary neighbourhood."""
    from quantized_training_tpu.numerics import quantize_to_posit_unit
    from quantized_training_tpu.numerics.posit import (
        _unit_mul_chain, quantize_to_posit_unit_mul,
    )

    rng = np.random.default_rng(0)
    for nbits, es in [(8, 1), (8, 2), (16, 1)]:
        _, chain = _unit_mul_chain(nbits, es)
        cuts = np.asarray([c for c, _ in chain], np.float32)
        eps = np.spacing(cuts)
        x = np.concatenate([
            rng.random(500_000, dtype=np.float32),
            np.exp(rng.uniform(np.log(1e-14), 0.0, 500_000)
                   ).astype(np.float32),
            cuts, cuts - eps, cuts + eps,
            np.float32([0.0, 1.0]),
        ])
        x = np.clip(x, 0.0, 1.0)
        a = np.asarray(quantize_to_posit_unit(jnp.asarray(x), nbits, es))
        b = np.asarray(quantize_to_posit_unit_mul(jnp.asarray(x), nbits, es))
        np.testing.assert_array_equal(a, b, err_msg=f"posit{nbits}_{es} f32")
