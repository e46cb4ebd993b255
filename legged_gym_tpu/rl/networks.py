"""Actor-critic networks as plain JAX param pytrees.

Equivalent of rsl_rl's ``ActorCritic`` (referenced from
legged_robot_config.py:213-224): elu MLPs [512, 256, 128] for actor and
critic, plus a state-independent per-dim action std parameter initialized
to ``init_noise_std`` (held as std, not log-std, matching rsl_rl).

Also the ``ActorCriticRecurrent`` option (legged_robot_config.py:221-224,
runner policy_class_name): an LSTM memory (rnn_hidden_size, rnn_num_layers)
in front of each MLP head, with the (h, c) carry held batch-FIRST
(N, layers, 2, hidden) so it shards on the env axis like every other
policy-boundary array.
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


def is_recurrent(policy_cfg):
    return getattr(policy_cfg, "rnn_type", None) is not None


def init_lstm(key, in_dim, hidden, num_layers, dtype=jnp.float32):
    """Stacked LSTM params: per layer {'w': (in+h, 4h), 'b': (4h,)} with
    torch's gate order (i, f, g, o) so extracted torch weights drop in."""
    layers = []
    keys = jax.random.split(key, num_layers)
    d = in_dim
    for k in keys:
        scale = 1.0 / jnp.sqrt(hidden)
        w = jax.random.uniform(k, (d + hidden, 4 * hidden), dtype,
                               -scale, scale)
        layers.append({"w": w, "b": jnp.zeros((4 * hidden,), dtype)})
        d = hidden
    return layers


def lstm_apply(layers, x, carry):
    """x (N, in); carry (N, L, 2, h) -> (out (N, h), new_carry)."""
    hs = []
    for li, layer in enumerate(layers):
        h = carry[:, li, 0]
        c = carry[:, li, 1]
        gates = jnp.concatenate([x, h], axis=-1) @ layer["w"] + layer["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        hs.append(jnp.stack([h, c], axis=1))      # (N, 2, h)
        x = h
    return x, jnp.stack(hs, axis=1)               # (N, L, 2, h)


def init_memory(n, policy_cfg, dtype=jnp.float32):
    """Zeroed LSTM carries for actor + critic: {'a': (N, L, 2, h), 'c': ...}
    (the analog of rsl_rl's memory_a/memory_c hidden states)."""
    shape = (n, policy_cfg.rnn_num_layers, 2, policy_cfg.rnn_hidden_size)
    return {"a": jnp.zeros(shape, dtype), "c": jnp.zeros(shape, dtype)}


def init_actor_critic(key, obs_dim, num_actions, policy_cfg,
                      critic_obs_dim=None):
    ka, kc = jax.random.split(key)
    std = jnp.full((num_actions,), policy_cfg.init_noise_std)
    if is_recurrent(policy_cfg):
        if policy_cfg.rnn_type != "lstm":
            raise NotImplementedError(
                f"rnn_type {policy_cfg.rnn_type} (reference supports "
                "lstm; helpers.py:181 'TODO add GRU')")
        ka, kma = jax.random.split(ka)
        kc, kmc = jax.random.split(kc)
        h = policy_cfg.rnn_hidden_size
        nl = policy_cfg.rnn_num_layers
        return {
            "mem_a": init_lstm(kma, obs_dim, h, nl),
            "mem_c": init_lstm(kmc, critic_obs_dim or obs_dim, h, nl),
            "actor": init_mlp(ka, [h] + list(policy_cfg.actor_hidden_dims)
                              + [num_actions]),
            "critic": init_mlp(kc, [h] + list(policy_cfg.critic_hidden_dims)
                               + [1]),
            "std": std,
        }
    actor = init_mlp(ka, [obs_dim] + list(policy_cfg.actor_hidden_dims)
                     + [num_actions])
    critic = init_mlp(kc, [critic_obs_dim or obs_dim]
                      + list(policy_cfg.critic_hidden_dims) + [1])
    return {"actor": actor, "critic": critic, "std": std}


def actor_mean_rnn(params, obs, act, carry):
    """Recurrent actor: (mean, new_carry)."""
    out, carry = lstm_apply(params["mem_a"], obs, carry)
    return mlp_apply(params["actor"], out, act), carry


def critic_value_rnn(params, obs, act, carry):
    out, carry = lstm_apply(params["mem_c"], obs, carry)
    return mlp_apply(params["critic"], out, act)[..., 0], carry


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
