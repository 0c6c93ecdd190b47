"""Whisper-compatible log-mel audio frontend, in pure jnp.

The reference ASR driver leans on HF's ``AutoFeatureExtractor`` (reference:
examples/speech_recognition/run_speech_recognition_seq2seq.py:330-372) — a
host-side numpy pass.  Here the whole frontend (pad → STFT → slaney mel →
log compression) is a jittable jnp function, so raw waveforms can stream to
the chip and feature extraction fuses into the same XLA program as the
encoder; it is pinned numerically against ``WhisperFeatureExtractor`` in
tests/test_audio.py.

Whisper recipe: 16 kHz, n_fft=400 (periodic hann), hop=160, 80 slaney-scale
mel bins to 8 kHz, magnitude^2, log10 clamped at 1e-10, floored at
(per-sample max - 8), affine (x + 4) / 4.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["mel_filter_bank", "log_mel_spectrogram", "WHISPER_N_SAMPLES"]

WHISPER_N_SAMPLES = 480_000  # 30 s at 16 kHz


def _hz_to_mel_slaney(f):
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    lin = 3.0 * f / 200.0
    log_region = f >= 1000.0
    log_mel = 15.0 + 27.0 * np.log(np.maximum(f, 1e-12) / 1000.0) / np.log(6.4)
    return np.where(log_region, log_mel, lin)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    lin = 200.0 * m / 3.0
    log_region = m >= 15.0
    log_hz = 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0)
    return np.where(log_region, log_hz, lin)


def mel_filter_bank(n_freqs: int = 201, n_mels: int = 80,
                    f_min: float = 0.0, f_max: float = 8000.0,
                    sr: int = 16000) -> np.ndarray:
    """(n_mels, n_freqs) slaney-normalized triangular filterbank (host-side
    constant; computed once, closed over by the jitted spectrogram)."""
    fft_freqs = np.linspace(0.0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]        # (F, n_mels+2)
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T          # (n_mels, F)

    # slaney norm: each triangle integrates to ~equal energy
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return (fb * enorm[:, None]).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels", "sr",
                                   "pad_to_samples"))
def log_mel_spectrogram(audio: jax.Array, *, n_fft: int = 400,
                        hop: int = 160, n_mels: int = 80, sr: int = 16000,
                        pad_to_samples: int = WHISPER_N_SAMPLES) -> jax.Array:
    """(B, T) or (T,) float waveform -> (B, n_mels, n_frames) log-mel.

    Matches WhisperFeatureExtractor: zero-pad/trim to ``pad_to_samples``,
    reflect-pad n_fft//2, periodic hann, |rfft|^2 with the final frame
    dropped, slaney mel, log10 -> per-sample (max - 8) floor -> (x + 4)/4.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    audio = audio.astype(jnp.float32)

    T = audio.shape[-1]
    if T < pad_to_samples:
        audio = jnp.pad(audio, ((0, 0), (0, pad_to_samples - T)))
    else:
        audio = audio[:, :pad_to_samples]

    half = n_fft // 2
    audio = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")

    n_frames = pad_to_samples // hop            # final frame dropped
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])        # (frames, n_fft)
    frames = audio[:, idx]                      # (B, frames, n_fft)

    window = jnp.asarray(
        np.hanning(n_fft + 1)[:-1].astype(np.float32))  # periodic hann
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)   # (B, frames, F)

    fb = jnp.asarray(mel_filter_bank(n_freqs=n_fft // 2 + 1, n_mels=n_mels,
                                     f_max=8000.0, sr=sr))
    mel = jnp.einsum("mf,btf->bmt", fb, power)  # (B, n_mels, frames)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    out = (log_spec + 4.0) / 4.0
    return out[0] if squeeze else out
