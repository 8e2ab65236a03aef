"""Golden tests for the on-device mel front end.

librosa is not installed in this environment, so parity is checked against
two independent references:
  * ``torch.stft`` configured identically to librosa's STFT (same framing,
    centering, reflect padding, symmetric hamming window) — torch and librosa
    STFT agree bit-for-bit up to float32 FFT noise.
  * a literal, loop-based float64 implementation of the Slaney mel filterbank
    and amplitude_to_db formulas written directly from their definitions.
"""
import numpy as np
import pytest
import torch

from bsed_tpu.config import AudioConfig
from bsed_tpu.ops.filterbank import hz_to_mel, mel_to_hz, mel_filterbank
from bsed_tpu.ops.mel import (MelFrontEnd, amplitude_to_db, frame_signal,
                              hamming_window, num_frames)


def _torch_stft_mag(audio_np, n_fft=2048, hop=255):
    x = torch.from_numpy(audio_np).double()
    win = torch.hamming_window(n_fft, periodic=False, dtype=torch.float64)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, window=win,
                      center=True, pad_mode="reflect", return_complex=True)
    return spec.abs().numpy().T  # (T, n_freqs)


def test_frame_count_matches_reference():
    cfg = AudioConfig()
    assert num_frames(cfg.n_samples, cfg.hop_size) == 1255 == cfg.max_frames


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(0)
    n = 32000  # 1 s clip keeps the test fast
    audio = rng.standard_normal(n).astype(np.float32)

    ref = _torch_stft_mag(audio)

    import jax.numpy as jnp
    frames = frame_signal(jnp.asarray(audio), 2048, 255)
    win = jnp.asarray(hamming_window(2048))
    mag = np.abs(np.asarray(jnp.fft.rfft(frames * win, axis=-1)))

    assert mag.shape == ref.shape == (num_frames(n, 255), 1025)
    # float32 FFT vs float64 reference: scale-relative tolerance
    assert np.max(np.abs(mag - ref)) < 1e-2 * max(1.0, ref.max())
    assert np.abs(mag - ref).mean() < 1e-4 * max(1.0, ref.max())


def test_mel_scale_round_trip_and_anchors():
    f = np.array([0.0, 200.0 / 3, 500.0, 1000.0, 4000.0, 16000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    # linear region: 200/3 Hz per mel
    assert np.isclose(hz_to_mel(200.0 / 3), 1.0)
    # log-region boundary: 1 kHz ↔ mel 15
    assert np.isclose(hz_to_mel(1000.0), 15.0)
    # one "octave-ish" logstep: mel 15+27 ↔ 6.4 kHz
    assert np.isclose(float(mel_to_hz(np.array(15.0 + 27.0))), 6400.0)


def test_mel_filterbank_matches_literal_construction():
    sr, n_fft, n_mels, fmin, fmax = 32000, 2048, 128, 0.0, 16000.0
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (1025, 128)
    assert fb.shape == (1 + n_fft // 2, n_mels)

    # Literal per-filter triangle: rises from mel_f[i] to mel_f[i+1], falls to
    # mel_f[i+2], evaluated at the FFT bin frequencies, norm=None.
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    ref = np.zeros((1 + n_fft // 2, n_mels))
    for m in range(n_mels):
        left, center, right = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        for k, f in enumerate(fftfreqs):
            if left < f < center:
                ref[k, m] = (f - left) / (center - left)
            elif center <= f < right:
                ref[k, m] = (right - f) / (right - center)
    np.testing.assert_allclose(fb, ref, atol=1e-6)
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()


def test_amplitude_to_db_formula_and_topdb():
    rng = np.random.default_rng(1)
    s = (rng.random((7, 5)).astype(np.float32)) * 100.0
    s[0, 0] = 0.0  # exercises the amin floor
    out = np.asarray(amplitude_to_db(s))

    ref = 10.0 * np.log10(np.maximum(1e-10, s.astype(np.float64) ** 2))
    ref = np.maximum(ref, ref.max() - 80.0)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_topdb_is_per_clip_in_batch():
    # two clips with very different peaks: the clamp must use each clip's max
    quiet = np.full((4, 3), 1e-8, np.float32)
    loud = np.full((4, 3), 1e3, np.float32)
    batch = np.stack([quiet, loud])
    out = np.asarray(amplitude_to_db(batch))
    assert np.isclose(out[0].max(), 10 * np.log10(1e-10), atol=1e-3)  # amin floor
    assert np.isclose(out[1].max(), 60.0, atol=1e-3)
    # quiet clip must NOT be clamped relative to the loud clip's peak
    assert out[0].min() > out[1].max() - 80.0 - 1e-3 or out[0].min() == out[0].max()


def test_factored_dft_matches_dense_and_golden():
    """The two-stage Cooley–Tukey DFT (ops/mel.py factored_dft_magnitude)
    must reproduce the dense DFT-matmul path; this pins the reshape /
    twiddle / k-order un-shuffle algebra. (Precision-tier speed/error
    trade-offs are TPU measurements — docs/PERF.md; on CPU all tiers
    compute in fp32 so they coincide.)"""
    cfg = AudioConfig()
    rng = np.random.default_rng(3)
    n = 32000
    audio = rng.standard_normal((2, n)).astype(np.float32) * 0.1

    dense = np.asarray(MelFrontEnd(cfg, algorithm="dense")(audio, log=True))
    fact = np.asarray(MelFrontEnd(cfg, algorithm="factored")(audio, log=True))
    assert np.max(np.abs(dense - fact)) < 1e-3  # dB

    # and directly against the float64 torch-reference dB mel for clip 0
    mag = _torch_stft_mag(audio[0])
    fb = mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                        cfg.mel_f_min, cfg.mel_f_max, dtype=np.float64)
    ref_db = 10 * np.log10(np.maximum(1e-10, (mag @ fb) ** 2))
    ref_db = np.maximum(ref_db, ref_db.max() - 80)
    assert np.max(np.abs(fact[0] - ref_db)) < 5e-2
    assert np.abs(fact[0] - ref_db).mean() < 1e-3


def test_precision_tiers_exist_and_run():
    """'highest'/'high'/'fast' are valid precision tiers; all produce
    finite, close outputs (identical math on CPU, different MXU pass
    counts on TPU — measured 4.6e-4 / 8.0e-4 / 0.22 dB max err on v5e)."""
    cfg = AudioConfig()
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    outs = [np.asarray(MelFrontEnd(cfg, precision=p)(audio, log=True))
            for p in ("highest", "high", "fast")]
    for o in outs:
        assert np.isfinite(o).all()
    assert np.max(np.abs(outs[0] - outs[1])) < 0.3  # loose: TPU-tier bound


def test_front_end_end_to_end_shapes_and_mel_parity():
    cfg = AudioConfig()
    fe = MelFrontEnd(cfg)
    rng = np.random.default_rng(2)
    n = 32000
    audio = rng.standard_normal((2, n)).astype(np.float32) * 0.1

    mel = np.asarray(fe(audio))
    t = num_frames(n, cfg.hop_size)
    assert mel.shape == (2, t, cfg.n_mels)
    assert np.isfinite(mel).all() and (mel >= 0).all()

    # float64 torch-reference mel for clip 0
    mag = _torch_stft_mag(audio[0])
    fb = mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                        cfg.mel_f_min, cfg.mel_f_max, dtype=np.float64)
    ref_mel = mag @ fb
    assert np.max(np.abs(mel[0] - ref_mel)) < 1e-3 * max(1.0, ref_mel.max())

    logmel = np.asarray(fe(audio, log=True))
    ref_db = 10 * np.log10(np.maximum(1e-10, ref_mel ** 2))
    ref_db = np.maximum(ref_db, ref_db.max() - 80)
    # dB tolerance 1e-3 is the north-star gate; allow slack for fp32 FFT
    assert np.abs(logmel[0] - ref_db).mean() < 1e-3
    assert np.max(np.abs(logmel[0] - ref_db)) < 5e-2


def test_block_stft_matches_dense_and_golden():
    """The overlap-reusing block STFT (ops/mel.py block_stft_magnitude:
    3 separable-Hamming hop-block transforms + 9-tap k-dependent complex
    stencil + remainder matmul) must reproduce the dense windowed-DFT
    path and the float64 torch reference."""
    cfg = AudioConfig()
    rng = np.random.default_rng(9)
    audio = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1

    dense = np.asarray(MelFrontEnd(cfg, algorithm="dense")(audio, log=True))
    blk = np.asarray(MelFrontEnd(cfg, algorithm="block")(audio, log=True))
    assert np.max(np.abs(dense - blk)) < 1e-3  # dB

    mag = _torch_stft_mag(audio[0])
    fb = mel_filterbank(cfg.sr, cfg.n_window, cfg.n_mels,
                        cfg.mel_f_min, cfg.mel_f_max, dtype=np.float64)
    ref_db = 10 * np.log10(np.maximum(1e-10, (mag @ fb) ** 2))
    ref_db = np.maximum(ref_db, ref_db.max() - 80)
    assert np.max(np.abs(blk[0] - ref_db)) < 5e-2
    assert np.abs(blk[0] - ref_db).mean() < 1e-3


def test_block_stft_hamming_separability_is_exact():
    """The rank-3 u/v decomposition must rebuild np.hamming exactly —
    the identity the whole block DFT rests on."""
    from bsed_tpu.ops.mel import block_dft_bases
    n, h = 2048, 255
    w = np.hamming(n)
    j = np.arange(n // h)
    r = np.arange(h)
    u = np.stack([np.full_like(j, 0.54, dtype=np.float64),
                  -0.46 * np.cos(2 * np.pi * j * h / (n - 1)),
                  0.46 * np.sin(2 * np.pi * j * h / (n - 1))])
    v = np.stack([np.ones(h), np.cos(2 * np.pi * r / (n - 1)),
                  np.sin(2 * np.pi * r / (n - 1))])
    rebuilt = np.einsum("pj,pr->jr", u, v).reshape(-1)
    np.testing.assert_allclose(rebuilt, w[:len(rebuilt)], atol=1e-12)
    # and the tail basis covers the remaining samples
    e_basis, d_re, d_im, e_tail = block_dft_bases(n, h)
    assert e_tail is not None and e_tail.shape[0] == n - h * (n // h)


def test_fused_block_mel_kernel_matches_dense():
    """The single-pallas-kernel front end (ops/mel_kernel.fused_block_mel:
    hop-block DFT + phase-twist banded-matmul frame recombination + |·| +
    mel projection, all VMEM-resident) must
    match the dense windowed-DFT path. The kernel's 3-product bf16 split is
    Precision.HIGH arithmetic, so compare against dense at 'high' and gate
    at the same ≤1e-3 dB the serving tier is held to (interpret mode off
    TPU exercises identical arithmetic)."""
    cfg = AudioConfig()
    rng = np.random.default_rng(11)
    audio = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1

    dense = np.asarray(
        MelFrontEnd(cfg, algorithm="dense", precision="highest")(
            audio, log=True))
    fused = np.asarray(
        MelFrontEnd(cfg, algorithm="block_pallas", precision="high")(
            audio, log=True))
    assert fused.shape == dense.shape
    assert np.max(np.abs(dense - fused)) < 1e-3  # dB

    # the fast tier must still be sane (single bf16 MXU product)
    fast = np.asarray(
        MelFrontEnd(cfg, algorithm="block_pallas", precision="fast")(
            audio, log=True))
    assert np.max(np.abs(dense - fast)) < 0.5  # dB


@pytest.mark.slow
def test_fused_block_mel_kernel_full_serving_shape():
    """Same gate at the EXACT serving shape (10 s → 1255 frames): 14 time
    tiles per clip including the padded tail tile, and the double-buffer
    batch wrap — the grid geometry the real chip runs."""
    cfg = AudioConfig()
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((2, cfg.n_samples)).astype(np.float32) * 0.1

    dense = np.asarray(
        MelFrontEnd(cfg, algorithm="dense", precision="highest")(
            audio, log=True))
    fused = np.asarray(
        MelFrontEnd(cfg, algorithm="block_pallas", precision="high")(
            audio, log=True))
    assert fused.shape == dense.shape == (2, 1255, 128)
    assert np.max(np.abs(dense - fused)) < 1e-3  # dB


def test_mel_kernel_bases_reject_unsupported_hops():
    """Geometry guards: the kernel packs hop_size+1 stage-1 basis rows into
    a 256-row plane and needs a non-empty tail block (rem = n_window −
    8·hop_size ≥ 1). hop_size == 256 (N//H == 8 but N %% H == 0) previously
    crashed inside np.pad with a negative width once the serving auto-gate
    admitted it; now both the builder and the serve gate reject it so
    construction falls back to the dense front end."""
    from bsed_tpu.ops.filterbank import mel_filterbank
    from bsed_tpu.ops.mel_kernel import build_mel_kernel_bases

    fb = mel_filterbank(sr=32000, n_fft=2048, n_mels=128, fmax=16000.0)
    with pytest.raises(ValueError, match="tail"):
        build_mel_kernel_bases(2048, 256, fb)          # rem == 0
    with pytest.raises(ValueError, match="256-row"):
        build_mel_kernel_bases(2060, 257, fb)          # 258 basis rows
    build_mel_kernel_bases(2048, 255, fb)              # parity shape: fine
