"""Encoder-embedding dumper.

Reference: /root/reference/src/save_features.py:235-283 (and
save_features_test.py) — runs the eval forward with a ``saved_feature_dir``
and dumps the (B, 313, 256) encoder outputs per batch as npy, consumed by
the t-SNE / SVM domain probes (visualize.py).
"""
from __future__ import annotations

import os
from typing import Callable, List

import jax.numpy as jnp
import numpy as np


def dump_features(encode_fn: Callable[[np.ndarray], np.ndarray],
                  loader, out_dir: str) -> List[str]:
    """encode_fn: linear mel batch → (B, T', D) embeddings; one npy per
    batch, named by batch index like the reference (:175)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, (mel, _target, _names, n_valid) in enumerate(loader):
        emb = np.asarray(encode_fn(mel))[:n_valid]
        path = os.path.join(out_dir, f"{i}.npy")
        np.save(path, emb)
        paths.append(path)
    return paths


def make_encode_fn(modules, params, batch_stats) -> Callable:
    """Returns the (B, T', 256) d_input features of the CRNN encoder."""
    import jax
    from bsed_tpu.ops.mel import amplitude_to_db

    @jax.jit
    def encode(mel):
        x = amplitude_to_db(jnp.asarray(mel))[..., None]
        _, d_input = modules.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": batch_stats["encoder"]}, x, train=False)
        return d_input

    return encode


def load_feature_dir(feature_dir: str) -> np.ndarray:
    """Concatenate all per-batch dumps (visualize.py loads these)."""
    files = sorted((f for f in os.listdir(feature_dir)
                    if f.endswith(".npy")),
                   key=lambda s: int(os.path.splitext(s)[0]))
    return np.concatenate([np.load(os.path.join(feature_dir, f))
                           for f in files], axis=0)
