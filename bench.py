"""Benchmark: fused mel+CRNN inference throughput (clips/s) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

The north-star target (BASELINE.md) is >=50x the reference's CPU clips/s for
the same pipeline (librosa mel front end + CRNN forward). librosa is not
installed here, so the CPU baseline is the torch equivalent measured live:
torch.stft (librosa-identical config) + mel matmul + log + torch CRNN
forward, on CPU. The TPU path is this framework's jitted
frame→rFFT→mel→dB→CRNN→predictor program on raw audio.
"""
import json
import sys
import time

import numpy as np


CLIP_SAMPLES = 320000   # 10 s @ 32 kHz
N_MELS = 128


def bench_tpu(batch_size: int = 64, iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    forward, _ = ge.entry()
    fn = jax.jit(forward)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (batch_size, CLIP_SAMPLES)).astype(np.float32))

    # warmup / compile
    out = fn(audio)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(audio)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_cpu_baseline(n_clips: int = 4) -> float:
    import torch
    torch.set_num_threads(1)
    from bsed_tpu.ops.filterbank import mel_filterbank
    from tests.torch_ref import TorchCRNN, TorchPredictor

    torch.manual_seed(0)
    model = TorchCRNN().eval()
    predictor = TorchPredictor().eval()
    fb = torch.from_numpy(mel_filterbank(dtype=np.float32))
    win = torch.hamming_window(2048, periodic=False)
    rng = np.random.default_rng(0)
    audio = torch.from_numpy(
        rng.standard_normal((n_clips, CLIP_SAMPLES)).astype(np.float32))

    def pipeline(x):
        with torch.no_grad():
            spec = torch.stft(x, n_fft=2048, hop_length=255, window=win,
                              center=True, pad_mode="reflect",
                              return_complex=True)
            mel = spec.abs().transpose(1, 2) @ fb          # (B, T, 128)
            power = mel.pow(2).clamp(min=1e-10)
            db = 10.0 * power.log10()
            db = torch.maximum(
                db, db.amax(dim=(1, 2), keepdim=True) - 80.0)
            enc, _ = model(db.unsqueeze(1))
            return predictor(enc)

    pipeline(audio[:1])  # warmup
    t0 = time.perf_counter()
    pipeline(audio)
    dt = time.perf_counter() - t0
    return n_clips / dt


def main():
    cpu_clips_per_sec = bench_cpu_baseline()
    tpu_clips_per_sec = bench_tpu()
    print(json.dumps({
        "metric": "fused mel+CRNN inference clips/s (one chip)",
        "value": round(tpu_clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_clips_per_sec / cpu_clips_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
