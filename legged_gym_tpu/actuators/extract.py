"""One-time TorchScript -> numpy weight extraction for the actuator nets
(resources/actuator_nets/*.pt; consumers at anymal.py:54, go1.py:46).

Torch is only needed the first time; the converted arrays are cached as
.npz under ~/.cache/legged_gym_tpu so TPU hosts without torch can run
from the cache.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/legged_gym_tpu/actuator_nets")


def load_torchscript_params(path):
    """Returns {param_or_buffer_name: np.ndarray} for a TorchScript file,
    via a host-side cache."""
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(CACHE_DIR, f"{os.path.basename(path)}.{digest}.npz")
    if os.path.exists(cache):
        return dict(np.load(cache))

    import torch
    m = torch.jit.load(path, map_location="cpu")
    out = {}
    for name, p in m.named_parameters():
        out[name] = p.detach().numpy()
    for name, b in m.named_buffers():
        out[name] = b.detach().numpy()
    os.makedirs(CACHE_DIR, exist_ok=True)
    np.savez(cache, **out)
    return out
