"""Bidirectional multi-layer GRU with torch-exact gate semantics.

Reference: /root/reference/src/models/RNN.py:7-16 (``nn.GRU(n_in, n_hidden,
bidirectional=True, batch_first=True, num_layers=2)``).

TPU-first design: the input projection for the whole sequence is hoisted out
of the recurrence into ONE large matmul per layer/direction — (B·T, D) @
(D, 3H) on the MXU — so the ``lax.scan`` carries only the (B, H) @ (H, 3H)
recurrent matmul. Gate order and the reset-gate placement match cuDNN/torch:

    r = σ(xr + hr),  z = σ(xz + hz),  n = tanh(xn + r ⊙ hn),
    h' = (1 − z) ⊙ n + z ⊙ h

(with hn including the recurrent bias inside the reset gate, torch's
linear-before-reset formulation) so reference checkpoints load losslessly.
Parameter names mirror torch (weight_ih_l0, weight_hh_l0_reverse, ...).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bsed_tpu.models.init import uniform_sqrt_h
from bsed_tpu.ops.dropout import FastDropout


def _gru_scan_bidir(xp2: jnp.ndarray, w_hh2: jnp.ndarray, b_hh2: jnp.ndarray,
                    unroll: int = 8) -> jnp.ndarray:
    """Both GRU directions in ONE forward scan over a stacked direction axis.

    The recurrence is the latency-bound tail of the whole pipeline (313
    sequential (B,H)@(H,3H) matmuls); running forward and backward
    directions as two separate scans serializes 2T steps. Instead the
    reverse direction's inputs are time-flipped so a single forward scan of
    T steps advances both directions at once — per-step work doubles (a
    (2,B,H)@(2,H,3H) batched matmul, still far below MXU tile size, so it
    is nearly free) while the sequential depth halves. Numerically
    identical per direction: batch rows of a matmul are independent.

    xp2: (2, B, T, 3H) with xp2[1] ALREADY time-flipped; w_hh2: (2, 3H, H);
    b_hh2: (2, 3H). Returns (2, B, T, H) with out[1] in flipped time order
    (caller un-flips).
    """
    h_dim = w_hh2.shape[2]
    _, batch = xp2.shape[:2]
    w_hh_t2 = jnp.swapaxes(w_hh2, 1, 2).astype(xp2.dtype)   # (2, H, 3H)
    b_hh2 = b_hh2.astype(xp2.dtype)[:, None, :]             # (2, 1, 3H)

    def step(h, x_t):                                        # h (2, B, H)
        hp = jnp.einsum("dbh,dhg->dbg", h, w_hh_t2) + b_hh2  # (2, B, 3H)
        xr, xz, xn = jnp.split(x_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, batch, h_dim), dtype=xp2.dtype)
    xs = jnp.moveaxis(xp2, 2, 0)                             # (T, 2, B, 3H)
    _, ys = jax.lax.scan(step, h0, xs, unroll=unroll)
    return jnp.moveaxis(ys, 0, 2)                            # (2, B, T, H)


class BidirectionalGRU(nn.Module):
    """(B, T, n_in) → (B, T, 2*n_hidden); inter-layer dropout as torch
    (applied to every layer output except the last)."""
    n_hidden: int
    num_layers: int = 2
    dropout: float = 0.0
    unroll: int = 8
    # None = float32 (reference parity); jnp.bfloat16 halves the activation
    # bandwidth of the scan (~1.6x faster recurrence on v5e; the output is
    # cast back to float32 for the downstream heads)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.n_hidden
        orth = jax.nn.initializers.orthogonal()
        bias_init = uniform_sqrt_h(h)
        compute_dtype = self.dtype or jnp.float32
        out = x.astype(compute_dtype)
        for layer in range(self.num_layers):
            in_dim = out.shape[-1]
            xps, w_hhs, b_hhs = [], [], []
            for suffix in ("", "_reverse"):
                name = f"l{layer}{suffix}"
                w_ih = self.param(f"weight_ih_{name}", orth, (3 * h, in_dim))
                w_hh = self.param(f"weight_hh_{name}", orth, (3 * h, h))
                b_ih = self.param(f"bias_ih_{name}", bias_init, (3 * h,))
                b_hh = self.param(f"bias_hh_{name}", bias_init, (3 * h,))
                # one MXU matmul for the whole sequence's input projection
                xp = jnp.einsum("btd,gd->btg", out,
                                w_ih.astype(compute_dtype),
                                preferred_element_type=compute_dtype) \
                    + b_ih.astype(compute_dtype)
                xps.append(xp)
                w_hhs.append(w_hh)
                b_hhs.append(b_hh)
            # both directions in one scan: reverse inputs time-flipped in,
            # outputs time-flipped back out (_gru_scan_bidir)
            xp2 = jnp.stack([xps[0], jnp.flip(xps[1], axis=1)])
            ys2 = _gru_scan_bidir(xp2, jnp.stack(w_hhs), jnp.stack(b_hhs),
                                  unroll=self.unroll)
            out = jnp.concatenate(
                [ys2[0], jnp.flip(ys2[1], axis=1)], axis=-1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = FastDropout(self.dropout, deterministic=not train)(out)
        return out.astype(jnp.float32)
