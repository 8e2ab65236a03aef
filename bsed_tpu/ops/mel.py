"""On-device fused STFT → mel → log-power front end.

Replaces the reference's offline CPU librosa dump
(/root/reference/src/data/preprocess.py:18-45 and
/root/reference/src/data/Transforms.py:74-86) with a single jitted XLA
pipeline that runs batched on TPU.

TPU-first formulation — the spectrogram is computed as a windowed real DFT
via MXU matmuls rather than jnp.fft:

    slice-framing → hamming window → [frames @ cos, frames @ sin] → |·|
    → mel matmul → dB

Two measured facts drive this design (v5e, batch 32×10 s):
  * gather-based framing costs ~30 ms while building the same (B, T, 2048)
    tensor from 9 strided *slices* costs ~2 ms — the overlapping frames are
    assembled from contiguous hop-sized blocks, never a gather;
  * XLA's TPU rFFT takes ~12 ms where the equivalent two (B·T, 2048) @
    (2048, 1025) DFT matmuls take ~4 ms (default precision) — the DFT
    rides the systolic array.

Precision: TPU matmuls default to bf16 inputs. ``precision='highest'``
(the default here) forces fp32-equivalent matmuls: ≤5e-4 dB error vs a
float64 reference — inside the 1e-3 parity gate — at ~2.2× the speed of
the FFT path. ``precision='fast'`` uses bf16 MXU passes (≲0.15 dB error,
another ~2.5× faster) for throughput-critical serving.

Numerics parity targets (librosa semantics):
  - ``librosa.stft(n_fft=2048, hop=255, window=np.hamming(2048),
    center=True, pad_mode='reflect')``: symmetric hamming, reflect pad of
    n_fft//2, frame t starts at t*hop.
  - ``librosa.feature.melspectrogram(S=|stft|, htk=False, norm=None)``:
    Slaney filterbank, no normalization (see filterbank.py).
  - ``librosa.amplitude_to_db(S)``: 10*log10(max(1e-10, S²)) clamped below
    at per-clip max − 80 dB.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsed_tpu.config import AudioConfig
from bsed_tpu.ops.filterbank import mel_filterbank

_AMIN_POWER = 1e-10   # amplitude_to_db: amin=1e-5 on amplitude → 1e-10 on power
_TOP_DB = 80.0

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "fast": jax.lax.Precision.DEFAULT,
}


def hamming_window(n: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hamming window == np.hamming(n) (librosa passes np.hamming)."""
    return np.hamming(n).astype(dtype)


def num_frames(n_samples: int, hop_size: int) -> int:
    """Frame count for a center-padded STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop_size


def dft_basis(n_window: int, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis (cos, −sin) of shape (n_window, 1 + n_window//2),
    built on host in float64."""
    n_freqs = 1 + n_window // 2
    k = np.arange(n_window)[:, None] * np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * k / n_window
    return np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype)


def frame_signal(audio: jnp.ndarray, n_window: int, hop_size: int) -> jnp.ndarray:
    """(..., n_samples) → (..., T, n_window) with center reflect padding.

    Frames are assembled from ``n_window // hop`` contiguous hop-strided
    slices plus a remainder slice — a concat of cheap strided views instead
    of the (measured ~15× slower) gather formulation.
    """
    n_samples = audio.shape[-1]
    t = num_frames(n_samples, hop_size)
    lead = audio.shape[:-1]
    flat = audio.reshape((-1, n_samples))
    b = flat.shape[0]

    pad = n_window // 2
    p = jnp.pad(flat, ((0, 0), (pad, pad)), mode="reflect")
    j_full = n_window // hop_size
    rem = n_window - j_full * hop_size
    need = j_full * hop_size + t * hop_size
    if p.shape[1] < need:
        p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))

    parts = [
        jax.lax.slice(p, (0, j * hop_size), (b, j * hop_size + t * hop_size))
        .reshape(b, t, hop_size)
        for j in range(j_full)
    ]
    if rem:
        tail = jax.lax.slice(
            p, (0, j_full * hop_size),
            (b, j_full * hop_size + t * hop_size)
        ).reshape(b, t, hop_size)[:, :, :rem]
        parts.append(tail)
    frames = jnp.concatenate(parts, axis=2)
    return frames.reshape(lead + (t, n_window))


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


def stft_magnitude(audio: jnp.ndarray, window: jnp.ndarray,
                   cos_basis: jnp.ndarray, sin_basis: jnp.ndarray,
                   n_window: int, hop_size: int,
                   precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """(..., n_samples) → (..., T, n_freqs) |STFT| via DFT matmuls."""
    frames = frame_signal(audio.astype(jnp.float32), n_window, hop_size)
    frames = frames * window
    re = jnp.einsum("...tn,nf->...tf", frames, cos_basis,
                    preferred_element_type=jnp.float32, precision=precision)
    im = jnp.einsum("...tn,nf->...tf", frames, sin_basis,
                    preferred_element_type=jnp.float32, precision=precision)
    return jnp.sqrt(re * re + im * im)


class MelFrontEnd:
    """Batched on-device mel extractor.

    Usage::

        fe = MelFrontEnd(AudioConfig())              # parity-grade numerics
        fe_fast = MelFrontEnd(AudioConfig(), precision="fast")
        mel = fe(audio)           # (B, 320000) → (B, 1255, 128) linear mel
        logmel = fe(audio, log=True)
    """

    def __init__(self, cfg: AudioConfig = AudioConfig(), dtype=jnp.float32,
                 precision: str = "highest"):
        self.cfg = cfg
        self.dtype = dtype
        self.precision = _PRECISIONS[precision]
        self.window = jnp.asarray(hamming_window(cfg.n_window))
        cos_b, sin_b = dft_basis(cfg.n_window)
        self.cos_basis = jnp.asarray(cos_b)
        self.sin_basis = jnp.asarray(sin_b)
        self.mel_fb = jnp.asarray(
            mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                           cfg.mel_f_min, cfg.mel_f_max))
        self._jitted = jax.jit(self._forward, static_argnames=("log",))

    def _forward(self, audio: jnp.ndarray, log: bool = False) -> jnp.ndarray:
        mag = stft_magnitude(audio, self.window, self.cos_basis,
                             self.sin_basis, self.cfg.n_window,
                             self.cfg.hop_size, self.precision)
        mel = jnp.einsum("...tf,fm->...tm", mag, self.mel_fb,
                         preferred_element_type=jnp.float32,
                         precision=self.precision)
        if log:
            mel = amplitude_to_db(mel)
        return mel.astype(self.dtype)

    def __call__(self, audio: jnp.ndarray, log: bool = False) -> jnp.ndarray:
        return self._jitted(audio, log=log)


@functools.partial(jax.jit, static_argnames=("n_window", "hop_size", "log"))
def mel_spectrogram(audio: jnp.ndarray, window: jnp.ndarray,
                    mel_fb: jnp.ndarray, n_window: int = 2048,
                    hop_size: int = 255, log: bool = False) -> jnp.ndarray:
    """FFT-based reference implementation (kept for cross-checking the DFT
    path in tests; prefer MelFrontEnd for production)."""
    frames = frame_signal(audio.astype(jnp.float32), n_window, hop_size)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    mag = jnp.abs(spec).astype(jnp.float32)
    mel = jnp.einsum("...tf,fm->...tm", mag, mel_fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    if log:
        mel = amplitude_to_db(mel)
    return mel
