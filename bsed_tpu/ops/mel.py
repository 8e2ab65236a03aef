"""On-device fused STFT → mel → log-power front end.

Replaces the reference's offline CPU librosa dump
(/root/reference/src/data/preprocess.py:18-45 and
/root/reference/src/data/Transforms.py:74-86) with a single jitted XLA
pipeline that runs batched on TPU:

    reflect-pad → frame → hamming window → rFFT → |·| → mel matmul (MXU) → dB

Numerics parity targets (librosa semantics):
  - ``librosa.stft(n_fft=2048, hop=255, window=np.hamming(2048), center=True,
    pad_mode='reflect')``: symmetric (periodic=False) hamming window, signal
    padded n_fft//2 on both sides with reflect mode, frame t starts at t*hop.
  - ``librosa.feature.melspectrogram(S=|stft|, htk=False, norm=None)``:
    Slaney filterbank, no normalization (see filterbank.py).
  - ``librosa.amplitude_to_db(S)`` = power_to_db(S², ref=1, amin=1e-10,
    top_db=80): 10*log10(max(amin, S²)) clamped below at per-clip max − 80 dB.

The mel projection is a (T, 1025) @ (1025, 128) matmul per clip — MXU work —
and XLA fuses the |·| and window elementwise stages around the FFT.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsed_tpu.config import AudioConfig
from bsed_tpu.ops.filterbank import mel_filterbank

_AMIN_POWER = 1e-10   # amplitude_to_db: amin=1e-5 on amplitude → 1e-10 on power
_TOP_DB = 80.0


def hamming_window(n: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hamming window == np.hamming(n) (librosa passes np.hamming)."""
    return np.hamming(n).astype(dtype)


def num_frames(n_samples: int, hop_size: int) -> int:
    """Frame count for a center-padded STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop_size


def frame_signal(audio: jnp.ndarray, n_window: int, hop_size: int) -> jnp.ndarray:
    """(..., n_samples) → (..., T, n_window) with center reflect padding."""
    pad = n_window // 2
    n_samples = audio.shape[-1]
    t = num_frames(n_samples, hop_size)
    padded = jnp.pad(
        audio,
        [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
        mode="reflect",
    )
    starts = np.arange(t) * hop_size
    idx = starts[:, None] + np.arange(n_window)[None, :]
    return padded[..., idx]


def amplitude_to_db(mel_amp: jnp.ndarray, top_db: Optional[float] = _TOP_DB,
                    per_clip_axes=(-2, -1)) -> jnp.ndarray:
    """librosa.amplitude_to_db with ref=1.0, amin=1e-5 (elementwise on
    amplitude), top_db clamp relative to the per-clip maximum."""
    power = jnp.square(mel_amp)
    log_spec = 10.0 * jnp.log10(jnp.maximum(_AMIN_POWER, power))
    # ref = 1.0 → subtract 10*log10(max(amin, 1.0)) = 0
    if top_db is not None:
        peak = jnp.max(log_spec, axis=per_clip_axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


class MelFrontEnd:
    """Batched on-device mel extractor.

    Usage::

        fe = MelFrontEnd(AudioConfig())
        mel = fe(audio)           # (B, 320000) → (B, 1255, 128) linear mel
        logmel = fe(audio, log=True)
    """

    def __init__(self, cfg: AudioConfig = AudioConfig(), dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.window = jnp.asarray(hamming_window(cfg.n_window))
        self.mel_fb = jnp.asarray(
            mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                           cfg.mel_f_min, cfg.mel_f_max))
        self._jitted = jax.jit(self._forward, static_argnames=("log",))

    def _forward(self, audio: jnp.ndarray, log: bool = False) -> jnp.ndarray:
        frames = frame_signal(audio.astype(jnp.float32),
                              self.cfg.n_window, self.cfg.hop_size)
        spec = jnp.fft.rfft(frames * self.window, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32)       # (B, T, 1025)
        mel = jnp.einsum("...tf,fm->...tm", mag, self.mel_fb,
                         preferred_element_type=jnp.float32)
        if log:
            mel = amplitude_to_db(mel)
        return mel.astype(self.dtype)

    def __call__(self, audio: jnp.ndarray, log: bool = False) -> jnp.ndarray:
        return self._jitted(audio, log=log)


@functools.partial(jax.jit, static_argnames=("n_window", "hop_size", "log"))
def mel_spectrogram(audio: jnp.ndarray, window: jnp.ndarray,
                    mel_fb: jnp.ndarray, n_window: int = 2048,
                    hop_size: int = 255, log: bool = False) -> jnp.ndarray:
    """Functional form of MelFrontEnd for use inside larger jitted programs."""
    frames = frame_signal(audio.astype(jnp.float32), n_window, hop_size)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.abs(spec).astype(jnp.float32)
    mel = jnp.einsum("...tf,fm->...tm", mag, mel_fb,
                     preferred_element_type=jnp.float32)
    if log:
        mel = amplitude_to_db(mel)
    return mel
