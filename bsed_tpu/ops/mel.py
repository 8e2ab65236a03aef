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
(the default here) forces fp32-equivalent matmuls (6 bf16 MXU passes):
≤5e-4 dB error vs a float64 reference — inside the 1e-3 parity gate — at
~2.2× the speed of the FFT path. ``precision='high'`` (3 passes) measures
8.0e-4 dB max error — still inside the gate — at 1.6× the speed of
'highest' (23.5 vs 38.0 ms/batch-64 on v5e) and is the serving default.
``precision='fast'`` uses single-pass bf16 (≲0.25 dB error, another ~1.6×
faster) for throughput-critical pipelines that tolerate it.

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
    "high": jax.lax.Precision.HIGH,
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


def factored_dft_bases(n_window: int, n1: int, dtype=np.float32):
    """Two-stage Cooley–Tukey factorization of the length-N real DFT,
    N = N1·N2, as three small constant tensors (built in float64 on host):

      inner  W2[n2, k2] = exp(−2πi·n2·k2/N2)      — (N2, N2) complex
      twiddle T[k2, n1] = exp(−2πi·n1·k2/N)        — (N2, N1) complex
      outer  W1[n1, k1] = exp(−2πi·n1·k1/N1)       — (N1, N1) complex

    With frames reshaped (…, N2, N1) (row-major: element [n2, n1] =
    x[N1·n2 + n1]), X[N2·k1 + k2] = Σ_{n1} W1[n1,k1]·T[k2,n1]·
    Σ_{n2} x[N1·n2+n1]·W2[n2,k2]. MAC count per frame drops from the dense
    2·N·(N/2+1) ≈ 4.2M (N=2048) to 2·N·N2 + 4·N·N1 = 2N(N2+2N1) — minimized
    at N1 = √(N/2): 0.52M for N1=32, an 8× FLOP reduction at identical
    (better, even: shorter dot products) fp32 accuracy.

    Returns ((w2_re, w2_im), (t_re, t_im), (w1_re, w1_im)) as dtype arrays.
    """
    assert n_window % n1 == 0
    n2 = n_window // n1
    a2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    at = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n_window
    a1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    return ((np.cos(a2).astype(dtype), (-np.sin(a2)).astype(dtype)),
            (np.cos(at).astype(dtype), (-np.sin(at)).astype(dtype)),
            (np.cos(a1).astype(dtype), (-np.sin(a1)).astype(dtype)))


def factored_dft_magnitude(frames: jnp.ndarray, bases, n1: int,
                           n_freqs: int,
                           precision=jax.lax.Precision.HIGHEST
                           ) -> jnp.ndarray:
    """|DFT| of windowed real frames (…, N) via the two-stage factorization
    (see factored_dft_bases). Returns (…, n_freqs)."""
    (w2_re, w2_im), (t_re, t_im), (w1_re, w1_im) = bases
    n = frames.shape[-1]
    n2 = n // n1
    x = frames.reshape(frames.shape[:-1] + (n2, n1))     # [n2, n1]
    # stage 1: length-N2 DFT over the stride-N1 subsequences (real input)
    i_re = jnp.einsum("...qp,qk->...kp", x, w2_re,
                      preferred_element_type=jnp.float32,
                      precision=precision)
    i_im = jnp.einsum("...qp,qk->...kp", x, w2_im,
                      preferred_element_type=jnp.float32,
                      precision=precision)
    # stage 2: twiddle (elementwise complex over [k2, n1])
    y_re = i_re * t_re - i_im * t_im
    y_im = i_re * t_im + i_im * t_re
    # stage 3: length-N1 DFT over n1 (complex × complex)
    x_re = (jnp.einsum("...kp,pl->...kl", y_re, w1_re,
                       preferred_element_type=jnp.float32,
                       precision=precision)
            - jnp.einsum("...kp,pl->...kl", y_im, w1_im,
                         preferred_element_type=jnp.float32,
                         precision=precision))
    x_im = (jnp.einsum("...kp,pl->...kl", y_re, w1_im,
                       preferred_element_type=jnp.float32,
                       precision=precision)
            + jnp.einsum("...kp,pl->...kl", y_im, w1_re,
                         preferred_element_type=jnp.float32,
                         precision=precision))
    # bin index k = N2·k1 + k2 → order (k1, k2) row-major, keep rfft half
    x_re = jnp.swapaxes(x_re, -1, -2).reshape(frames.shape[:-1] + (n,))
    x_im = jnp.swapaxes(x_im, -1, -2).reshape(frames.shape[:-1] + (n,))
    x_re = x_re[..., :n_freqs]
    x_im = x_im[..., :n_freqs]
    return jnp.sqrt(x_re * x_re + x_im * x_im)


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
                 precision: str = "highest", algorithm: str = "dense",
                 factor_n1: int = 32):
        """``algorithm``: 'dense' (single DFT matmul pair, default) or
        'factored' (two-stage Cooley–Tukey DFT). Both hit ≤5e-4 dB vs
        float64 at precision='highest' (tests/test_mel.py). Measured on
        v5e the factored path does NOT win despite 8× fewer MACs: its
        N1=32/N2=64 contractions can't fill the 128×128 MXU tiles and the
        k-order un-shuffle costs a transpose, so it is layout-bound
        (36–43 ms/batch-64 vs dense 38/23.5/14.9 ms at
        highest/high/fast) — kept as an exactness-tested reference and for
        future hardware where small-matrix throughput improves."""
        self.cfg = cfg
        self.dtype = dtype
        self.precision = _PRECISIONS[precision]
        self.algorithm = algorithm
        self.factor_n1 = factor_n1
        self.n_freqs = 1 + cfg.n_window // 2
        self.window = jnp.asarray(hamming_window(cfg.n_window))
        if algorithm == "factored":
            self.factored_bases = jax.tree.map(
                jnp.asarray, factored_dft_bases(cfg.n_window, factor_n1))
        else:
            cos_b, sin_b = dft_basis(cfg.n_window)
            self.cos_basis = jnp.asarray(cos_b)
            self.sin_basis = jnp.asarray(sin_b)
        self.mel_fb = jnp.asarray(
            mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                           cfg.mel_f_min, cfg.mel_f_max))
        self._jitted = jax.jit(self._forward, static_argnames=("log",))

    def _forward(self, audio: jnp.ndarray, log: bool = False) -> jnp.ndarray:
        if self.algorithm == "factored":
            frames = frame_signal(audio.astype(jnp.float32),
                                  self.cfg.n_window, self.cfg.hop_size)
            mag = factored_dft_magnitude(frames * self.window,
                                         self.factored_bases, self.factor_n1,
                                         self.n_freqs, self.precision)
        else:
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
