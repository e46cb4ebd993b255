"""ANYdrive v3 SEA actuator network: 2-layer LSTM(2 -> 8 -> 8) + linear
head, with fixed input scale (2.0, 0.25) and output scale 20 N*m
(anydrive_v3_lstm.pt; consumer contract at anymal.py:62-81: input per
joint (pos_err, vel), hidden/cell (2, envs*12, 8), output = torque;
hidden state zeroed per env on reset, anymal.py:56-60).

Batch-last JAX reimplementation: one LSTM cell step per sim dt over the
flattened (joint x env) batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.actuators.extract import load_torchscript_params


class SEANet:
    def __init__(self, path):
        p = load_torchscript_params(path)
        # torch LSTM gate order: i, f, g, o (rows of the 4H x in matrices)
        self.layers = []
        for l in (0, 1):
            self.layers.append({
                "w_ih": jnp.asarray(p[f"lstm.weight_ih_l{l}"]),   # (32, in)
                "w_hh": jnp.asarray(p[f"lstm.weight_hh_l{l}"]),   # (32, 8)
                "b": jnp.asarray(p[f"lstm.bias_ih_l{l}"]
                                 + p[f"lstm.bias_hh_l{l}"]),      # (32,)
            })
        self.w_out = jnp.asarray(p["linear.weight"])              # (1, 8)
        self.b_out = jnp.asarray(p["linear.bias"])                # (1,)
        self.in_scale = jnp.asarray(
            np.asarray(p["in_scale"]).reshape(2))                 # (2,)
        self.out_scale = float(np.asarray(p["out_scale"]).reshape(()))
        self.hidden = 8

    def init_state(self, batch, dtype=jnp.float32):
        """(h, c): each (2 layers, 8, batch) — batch = nq * N flattened."""
        z = jnp.zeros((2, self.hidden, batch), dtype)
        return z, z

    def __call__(self, pos_err, vel, state):
        """pos_err, vel: (B,) flattened joint-major batch. Returns
        (torque (B,), new_state)."""
        h, c = state
        x = jnp.stack([pos_err * self.in_scale[0],
                       vel * self.in_scale[1]])                   # (2, B)
        new_h, new_c = [], []
        for l, lay in enumerate(self.layers):
            gates = lay["w_ih"] @ x + lay["w_hh"] @ h[l] \
                + lay["b"][:, None]                               # (32, B)
            gi, gf, gg, go = jnp.split(gates, 4, axis=0)
            i = jax.nn.sigmoid(gi)
            f = jax.nn.sigmoid(gf)
            g = jnp.tanh(gg)
            o = jax.nn.sigmoid(go)
            cl = f * c[l] + i * g
            hl = o * jnp.tanh(cl)
            new_h.append(hl)
            new_c.append(cl)
            x = hl
        tau = self.out_scale * (self.w_out @ x + self.b_out[:, None])[0]
        return tau, (jnp.stack(new_h), jnp.stack(new_c))
