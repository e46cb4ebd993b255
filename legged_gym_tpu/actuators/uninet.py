"""Go1/Aliengo per-leg actuator MLP ("UniNet", go1_net.pt): shared
MLP [30 -> 128 -> 128 -> 128 -> 3] with tanh, applied to each of 4 legs
(go1.py:22-35). Input per leg = 5-step history of normalized
(pos_err, vel) for 3 joints, interleaved per joint as
[q_err(5), dq(5)] x 3 (go1.py:79-107); normalization stats hard-coded at
go1.py:50-53; output dVel is rescaled by vel_std.

Reference quirk (go1.py:68-76): the output is computed and DISCARDED —
position-drive PD is returned in both branches, so Go1/Aliengo training
dynamics never see the net. We mirror that by default
(cfg.control.actuator_net_discard_output=True) but keep the module
functional; unlike the reference's numpy per-joint Python loops + CPU
round-trips (a major perf sink noted in SURVEY §2.2.10), the history
buffer here is a rolled JAX array inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.actuators.extract import load_torchscript_params

LEN_HIST = 5
LEG_DOF = 3
LEG_NUM = 4

# go1.py:50-53 (per-joint stats tiled across legs)
POS_ERR_MEAN = np.array([0.00036437, 0.01540757, -0.00972657])
POS_ERR_STD = np.array([0.11722939, 0.19275887, 0.28700321])
VEL_MEAN = np.array([-0.00017714, -0.00024455, 0.0005956])
VEL_STD = np.array([2.31517027, 3.84613839, 5.52599008])


class UniNet:
    def __init__(self, path):
        p = load_torchscript_params(path)
        self.weights = [(jnp.asarray(p[f"architecture.{i}.weight"]),
                         jnp.asarray(p[f"architecture.{i}.bias"]))
                        for i in (0, 2, 4, 6)]
        self.pos_err_mean = jnp.asarray(np.tile(POS_ERR_MEAN, LEG_NUM))
        self.pos_err_std = jnp.asarray(np.tile(POS_ERR_STD, LEG_NUM))
        self.vel_mean = jnp.asarray(np.tile(VEL_MEAN, LEG_NUM))
        self.vel_std = jnp.asarray(np.tile(VEL_STD, LEG_NUM))

    def init_state(self, n, dtype=jnp.float32):
        """History buffers: (12, LEN_HIST, N) for pos_err and vel."""
        z = jnp.zeros((LEG_DOF * LEG_NUM, LEN_HIST, n), dtype)
        return {"pos_err": z, "vel": z}

    def core(self, x):
        """x: (30, B) one leg's input (batch-last). Returns (3, B)."""
        for i, (w, b) in enumerate(self.weights):
            x = w @ x + b[:, None]
            if i < len(self.weights) - 1:
                x = jnp.tanh(x)
        return x

    def __call__(self, target_q, q, qd, state):
        """Advance history + evaluate (go1.py:79-107).

        target_q/q/qd: (12, N) batch-last. Returns (dVel (12, N), state').
        """
        pos_err_s = ((target_q - q) - self.pos_err_mean[:, None]) \
            / self.pos_err_std[:, None]
        vel_s = (qd - self.vel_mean[:, None]) / self.vel_std[:, None]
        pe = jnp.concatenate([state["pos_err"][:, 1:],
                              pos_err_s[:, None, :]], axis=1)
        ve = jnp.concatenate([state["vel"][:, 1:],
                              vel_s[:, None, :]], axis=1)
        # per-joint interleave [q_err(5), dq(5)] x 3 joints -> (30, N)/leg
        n = q.shape[-1]
        per_joint = jnp.concatenate([pe, ve], axis=1)   # (12, 10, N)
        outs = []
        for leg in range(LEG_NUM):
            block = per_joint[leg * LEG_DOF:(leg + 1) * LEG_DOF]
            x = block.reshape(LEG_DOF * 2 * LEN_HIST, n)
            outs.append(self.core(x))
        dvel = jnp.concatenate(outs, axis=0) * self.vel_std[:, None]
        return dvel, {"pos_err": pe, "vel": ve}
