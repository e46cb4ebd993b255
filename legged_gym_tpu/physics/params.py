"""Per-env spatial-inertia parameters (the domain-randomization surface).

The reference randomizes each original rigid body's mass at env-creation
time (legged_robot.py:312-335: base += U(added_mass_range), limbs
*= 1 + U(added_limb_percentage), inertia recomputed). Here each original
body contributes a spatial-inertia term that is linear in its mass scale,
so the per-env link inertias are an exact small linear map of the per-body
scale vector — evaluated at reset, inside jit.
"""
import jax.numpy as jnp
import numpy as np


def nominal_link_params(model, dtype=jnp.float32):
    """(nl, 10) nominal spatial inertia per link."""
    params = np.zeros((model.nl, 10))
    for b in range(model.n_orig):
        params[model.contrib_link[b]] += model.contrib[b]
    return jnp.asarray(params, dtype)


def link_params_from_scales(model, scales, dtype=jnp.float32):
    """scales: (n_orig, N) per-original-body mass scales -> (nl, 10, N)."""
    n = scales.shape[-1]
    out = jnp.zeros((model.nl, 10, n), dtype)
    for b in range(model.n_orig):
        li = int(model.contrib_link[b])
        cb = jnp.asarray(model.contrib[b], dtype)[:, None]
        out = out.at[li].add(cb * scales[b][None])
    return out


def broadcast_nominal(model, n, dtype=jnp.float32):
    """(nl, 10, N) nominal params broadcast over the batch."""
    return jnp.broadcast_to(nominal_link_params(model, dtype)[:, :, None],
                            (model.nl, 10, n))
