"""Log-mel frontend parity vs WhisperFeatureExtractor (VERDICT r2 item 10).

The oracle is HF's host-side numpy implementation (the exact frontend the
reference ASR driver runs, reference:
examples/speech_recognition/run_speech_recognition_seq2seq.py:330-372);
ours is a jittable jnp function.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.data.audio import (
    WHISPER_N_SAMPLES, log_mel_spectrogram, mel_filter_bank,
)


@pytest.fixture(scope="module")
def hf_extractor():
    try:
        from transformers import WhisperFeatureExtractor
    except Exception:
        pytest.skip("transformers unavailable")
    return WhisperFeatureExtractor()


def test_mel_filter_bank_matches_hf(hf_extractor):
    np.testing.assert_allclose(
        mel_filter_bank(), np.asarray(hf_extractor.mel_filters).T,
        rtol=0, atol=1e-6)


@pytest.mark.parametrize("n_samples", [16000, 480000, 500000])
def test_log_mel_matches_whisper_extractor(hf_extractor, n_samples):
    rng = np.random.default_rng(0)
    # tone + noise so the spectrum has real structure (not just noise floor)
    t = np.arange(n_samples) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)
         + 0.1 * rng.normal(size=n_samples)).astype(np.float32)

    ref = hf_extractor(x, sampling_rate=16000,
                       return_tensors="np")["input_features"][0]
    got = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
    assert got.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_log_mel_batched_and_jittable():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 32000)).astype(np.float32) * 0.2
    out = log_mel_spectrogram(jnp.asarray(x))
    assert out.shape == (3, 80, WHISPER_N_SAMPLES // 160)
    # batched == per-sample
    one = log_mel_spectrogram(jnp.asarray(x[1]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one),
                               rtol=0, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()
