"""Actor-critic networks as plain JAX param pytrees.

Equivalent of rsl_rl's ``ActorCritic`` (referenced from
legged_robot_config.py:213-224): elu MLPs [512, 256, 128] for actor and
critic, plus a state-independent per-dim action std parameter initialized
to ``init_noise_std`` (held as std, not log-std, matching rsl_rl).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "lrelu": jax.nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def activation_fn(name):
    return _ACTIVATIONS[name]


def init_mlp(key, dims, dtype=jnp.float32):
    """dims = [in, h1, ..., out]. Orthogonal init, sqrt(2) gain on hidden
    layers, 1.0 on the output layer."""
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        gain = 1.0 if i == len(dims) - 2 else jnp.sqrt(2.0)
        w = jax.nn.initializers.orthogonal(gain)(
            k, (dims[i], dims[i + 1]), dtype)
        b = jnp.zeros((dims[i + 1],), dtype)
        layers.append({"w": w, "b": b})
    return layers


def mlp_apply(layers, x, act):
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = act(x)
    return x


def init_actor_critic(key, obs_dim, num_actions, policy_cfg,
                      critic_obs_dim=None):
    ka, kc = jax.random.split(key)
    actor = init_mlp(ka, [obs_dim] + list(policy_cfg.actor_hidden_dims)
                     + [num_actions])
    critic = init_mlp(kc, [critic_obs_dim or obs_dim]
                      + list(policy_cfg.critic_hidden_dims) + [1])
    std = jnp.full((num_actions,), policy_cfg.init_noise_std)
    return {"actor": actor, "critic": critic, "std": std}


def actor_mean(params, obs, act):
    return mlp_apply(params["actor"], obs, act)


def critic_value(params, obs, act):
    return mlp_apply(params["critic"], obs, act)[..., 0]


def sample_action(key, params, obs, act):
    """Returns (action, log_prob, mean, std)."""
    mean = actor_mean(params, obs, act)
    std = jnp.broadcast_to(params["std"], mean.shape)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * eps
    logp = gaussian_log_prob(action, mean, std)
    return action, logp, mean, std


def gaussian_log_prob(x, mean, std):
    var = std * std
    return jnp.sum(-0.5 * jnp.square(x - mean) / var - jnp.log(std)
                   - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std),
                   axis=-1)


def gaussian_kl(mu_old, std_old, mu_new, std_new):
    """Per-sample KL(old || new), rsl_rl's adaptive-LR formula."""
    return jnp.sum(
        jnp.log(std_new / std_old + 1e-5)
        + (jnp.square(std_old) + jnp.square(mu_old - mu_new))
        / (2.0 * jnp.square(std_new)) - 0.5, axis=-1)
