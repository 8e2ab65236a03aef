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


def bench_tpu(batch_size: int = 64, iters: int = 10):
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    forward, _ = ge.entry()
    fn = jax.jit(forward)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (batch_size, CLIP_SAMPLES)).astype(np.float32))

    # warmup / compile; if the Pallas mel kernel path fails on this stack,
    # fall back to the dense-DFT front end rather than losing the headline
    try:
        compiled = fn.lower(audio).compile()
        out = compiled(audio)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"# kernel serving path failed ({type(e).__name__}: {e}); "
              "falling back to dense mel", file=sys.stderr)
        forward, _ = ge.entry(mel_algorithm="dense")
        fn = jax.jit(forward)
        compiled = fn.lower(audio).compile()
        out = compiled(audio)
        jax.block_until_ready(out)

    # distinct input per iteration: measured identical to the same-args
    # loop (36.6 vs 36.7 ms/iter), kept as insurance against any
    # same-value result caching in experimental backends
    audios = [audio + jnp.float32(i + 1) * 1e-6 for i in range(iters)]
    jax.block_until_ready(audios)

    # fastest-of-3 windows: robust to transient host-core contention
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for a in audios:
            out = compiled(a)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)

    # logical-FLOP utilization from XLA's own cost model (v5e bf16 peak
    # ~197 TFLOP/s; 'high' precision issues ~3 MXU passes per logical
    # matmul FLOP, so the MXU-issue utilization is ~3x this number)
    flops_util = None
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            flops_util = flops * iters / dt / 197e12
    except Exception:
        pass
    return batch_size * iters / dt, flops_util


def bench_train(iters: int = 20) -> dict:
    """Training throughput: the flagship MT+ISP step (9 model forwards +
    backward) at the reference batch (12 SYN + 12 real), in the perf
    configuration (fused_streams + bf16 activation dtype)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from bsed_tpu.config import get_config
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline_mt_isp")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, fused_streams=True))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    rng = np.random.default_rng(0)
    bs = cfg.train.batch_size
    t_in, f = cfg.audio.max_frames, cfg.audio.n_mels
    batch = {
        "syn": jnp.asarray(np.abs(rng.standard_normal(
            (bs, t_in, f))).astype(np.float32)),
        "syn_strong": jnp.asarray((rng.random(
            (bs, cfg.n_frames, cfg.nclass)) > 0.9).astype(np.float32)),
        "real": jnp.asarray(np.abs(rng.standard_normal(
            (bs, t_in, f))).astype(np.float32)),
        "real_weak": jnp.asarray((rng.random(
            (bs, cfg.nclass)) > 0.8).astype(np.float32)),
    }
    epoch = jnp.asarray(0.0)
    # keys made OUTSIDE the timed loop: under the tunnel every extra tiny
    # dispatch costs a ~27 ms round trip and can break step pipelining.
    # Timed as fastest-of-4 windows: the measurement is host-dispatch
    # sensitive, so a busy host core inflates the mean but not the best
    # window.
    windows = 4
    keys = list(jax.random.split(jax.random.key(1), windows * iters + 3))
    jax.block_until_ready(keys)
    for i in range(3):  # compile + pipeline warmup
        state, m = step(state, batch, keys[i], epoch)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    k = 3
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, keys[k], epoch)
            k += 1
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"train_ms_per_step": round(best * 1e3, 2),
            "train_clips_per_s": round(2 * bs / best, 1)}


def bench_train_e2e() -> dict:
    """END-TO-END training throughput: device-resident three-stream loader
    + background prefetch + the fused MT+ISP step, full clip shapes —
    i.e. what an actual epoch costs, not just the jitted step."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from bsed_tpu.config import get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import ThreeStreamLoader
    from bsed_tpu.data.prefetch import prefetch
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline_mt_isp")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, fused_streams=True))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    syn = SyntheticDataSource(cfg, n_items=240, seed=1)
    weak = SyntheticDataSource(cfg, n_items=60, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=180, seed=3, weak_only=True)
    loader = ThreeStreamLoader(syn, weak, unlab,
                               batch_size=cfg.train.batch_size,
                               device_resident=True)
    # one key + one epoch scalar per epoch — the step folds state.step into
    # the key itself, so the loop issues exactly two dispatches per step
    # (batch assembly + train step), like Trainer.train_epoch
    keys = list(jax.random.split(jax.random.key(1), 3))
    epochs = [jnp.asarray(float(e)) for e in range(3)]
    jax.block_until_ready(keys)
    for batch in loader.epoch(0):  # compile + array upload
        state, m = step(state, batch, keys[0], epochs[0])
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for e in (1, 2):
        n = 0
        t0 = time.perf_counter()
        for batch in prefetch(loader.epoch(e), depth=2):
            state, m = step(state, batch, keys[e], epochs[e])
            n += 1
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / n)
    bs = 2 * cfg.train.batch_size
    return {"train_e2e_ms_per_step": round(best * 1e3, 2),
            "train_e2e_clips_per_s": round(bs / best, 1)}


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
    # best-of-3: a busy host core must not slow the baseline (that would
    # inflate vs_baseline dishonestly)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pipeline(audio)
        dt = min(dt, time.perf_counter() - t0)
    return n_clips / dt


def main():
    cpu_clips_per_sec = bench_cpu_baseline()
    # train bench MUST run before the serving bench: executing the serving
    # program leaves this process in a state where subsequent small-step
    # dispatch serializes at ~137 ms/step (vs 1.5 ms in a fresh process;
    # reproduced deterministically, survives gc + jax.clear_caches()).
    # Order the measurements instead of paying a subprocess.
    try:
        train_metrics = bench_train()
        train_metrics.update(bench_train_e2e())
    except Exception as e:  # train bench is auxiliary — never break the line
        train_metrics = {"train_bench_error": f"{type(e).__name__}: {e}"}
    tpu_clips_per_sec, flops_util = bench_tpu()
    result = {
        "metric": "fused mel+CRNN inference clips/s (one chip)",
        "value": round(tpu_clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_clips_per_sec / cpu_clips_per_sec, 2),
    }
    if flops_util is not None:
        result["logical_flops_utilization"] = round(flops_util, 4)
    result.update(train_metrics)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
