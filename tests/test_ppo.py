"""PPO machinery tests on a stub env (no physics -> fast compile).

Checks GAE against a numpy reference, timeout bootstrapping
(legged_robot.py:191-193 consumer semantics), learning on a trivial
control problem, and the adaptive-KL learning-rate rule."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.config import AlgorithmCfg, PolicyCfg
from legged_gym_tpu.envs.legged_env import Transition
from legged_gym_tpu.rl.ppo import init_train_state, make_learn_fn


class PointEnv:
    """1-D point mass: obs = pos, action pushes it; reward = -pos^2.
    Optimal policy drives pos to 0."""

    num_envs = 16
    num_actions = 1
    obs_dim = 2
    max_episode_length = 100

    def reset(self, key):
        pos = jax.random.normal(key, (self.num_envs,))
        state = {"pos": pos, "t": jnp.zeros(self.num_envs, jnp.int32),
                 "key": key}
        return state, self._obs(pos)

    def _obs(self, pos):
        return jnp.stack([pos, jnp.ones_like(pos)], axis=-1)

    def step(self, state, actions):
        pos = state["pos"] + 0.1 * jnp.tanh(actions[:, 0])
        t = state["t"] + 1
        reward = -jnp.square(pos)
        time_out = t >= self.max_episode_length
        done = time_out
        key, k = jax.random.split(state["key"])
        new_pos = jnp.where(done, jax.random.normal(k, pos.shape), pos)
        new_t = jnp.where(done, 0, t)
        tr = Transition(
            obs=self._obs(new_pos), privileged_obs=None,
            reward=reward, done=done,
            time_out=time_out, episode_sums={},
            episode_count=jnp.sum(done.astype(jnp.float32)),
            episode_length_sum=jnp.sum(
                t * done).astype(jnp.float32),
            terrain_level_mean=jnp.zeros(()),
            max_command_x=jnp.zeros(()),
            torques=jnp.zeros((1, self.num_envs)),
            feet_contact_z=jnp.zeros((0, self.num_envs)))
        return {"pos": new_pos, "t": new_t, "key": key}, tr


def _np_gae(rewards, values, dones, last_value, gamma, lam):
    T, N = rewards.shape
    adv = np.zeros((T, N))
    next_adv = np.zeros(N)
    next_val = last_value
    for t in reversed(range(T)):
        nd = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_val * nd - values[t]
        next_adv = delta + gamma * lam * nd * next_adv
        adv[t] = next_adv
        next_val = values[t]
    return adv


def test_gae_matches_numpy():
    gamma, lam = 0.99, 0.95
    rng = np.random.default_rng(0)
    T, N = 8, 4
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random((T, N)) < 0.2).astype(np.float32)
    last_value = rng.normal(size=N).astype(np.float32)

    def gae_step(carry, xs):
        adv_next, v_next = carry
        r, v, nd = xs
        delta = r + gamma * v_next * nd - v
        adv = delta + gamma * lam * nd * adv_next
        return (adv, v), adv

    (_, _), adv = jax.lax.scan(
        gae_step, (jnp.zeros(N), jnp.asarray(last_value)),
        (jnp.asarray(rewards), jnp.asarray(values),
         jnp.asarray(1.0 - dones)),
        reverse=True)
    expected = _np_gae(rewards, values, dones, last_value, gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4,
                               atol=1e-5)


def test_ppo_learns_point_env():
    env = PointEnv()
    pol = PolicyCfg(actor_hidden_dims=[32, 32], critic_hidden_dims=[32, 32])
    alg = AlgorithmCfg(num_mini_batches=2, learning_rate=1e-3)
    ts = init_train_state(jax.random.PRNGKey(0), env.obs_dim,
                          env.num_actions, pol, alg)
    learn = jax.jit(make_learn_fn(env, pol, alg, num_steps=16))
    env_state, obs = env.reset(jax.random.PRNGKey(1))

    first = None
    for it in range(40):
        ts, env_state, obs, metrics = learn(ts, env_state, obs)
        r = float(metrics["mean_step_reward"])
        if first is None:
            first = r
    assert np.isfinite(r)
    assert r > first, f"no improvement: {first} -> {r}"
    # lr must have stayed in the adaptive clamp range
    lr = float(metrics["lr"])
    assert 1e-5 <= lr <= 1e-2


def test_recurrent_ppo_learns_point_env():
    """ActorCriticRecurrent option (reference legged_robot_config.py:221-224
    + runner policy_class_name): LSTM memory in front of the MLP heads.
    Same trivial control problem must still improve, hidden states must
    ride the carried obs pack."""
    from legged_gym_tpu.rl import networks as nets

    env = PointEnv()
    pol = PolicyCfg(actor_hidden_dims=[32], critic_hidden_dims=[32],
                    rnn_type="lstm", rnn_hidden_size=16, rnn_num_layers=1)
    alg = AlgorithmCfg(num_mini_batches=2, learning_rate=1e-3)
    ts = init_train_state(jax.random.PRNGKey(0), env.obs_dim,
                          env.num_actions, pol, alg)
    assert "mem_a" in ts.params and "mem_c" in ts.params
    learn = jax.jit(make_learn_fn(env, pol, alg, num_steps=16))
    env_state, obs = env.reset(jax.random.PRNGKey(1))
    obs = (obs, nets.init_memory(env.num_envs, pol))

    first = None
    for it in range(40):
        ts, env_state, obs, metrics = learn(ts, env_state, obs)
        r = float(metrics["mean_step_reward"])
        if first is None:
            first = r
    # carried pack keeps (obs, memory) shape
    assert isinstance(obs, tuple) and set(obs[1]) == {"a", "c"}
    assert obs[1]["a"].shape == (env.num_envs, 1, 2, 16)
    assert np.isfinite(r)
    assert r > first, f"no improvement: {first} -> {r}"


def test_lstm_apply_matches_torch_semantics():
    """Gate order/i-f-g-o and carry layout: one step of lstm_apply must
    match torch.nn.LSTM with the same weights."""
    torch = __import__("torch")
    from legged_gym_tpu.rl import networks as nets

    rng = np.random.default_rng(0)
    in_dim, hidden, n = 5, 7, 3
    x = rng.normal(size=(n, in_dim)).astype(np.float32)
    h0 = rng.normal(size=(n, hidden)).astype(np.float32)
    c0 = rng.normal(size=(n, hidden)).astype(np.float32)

    t_lstm = torch.nn.LSTM(in_dim, hidden, num_layers=1,
                           batch_first=False)
    with torch.no_grad():
        out_t, (h_t, c_t) = t_lstm(
            torch.from_numpy(x).unsqueeze(0),
            (torch.from_numpy(h0).unsqueeze(0),
             torch.from_numpy(c0).unsqueeze(0)))

    # torch packs weight_ih (4h, in), weight_hh (4h, h), two biases
    w = np.concatenate([t_lstm.weight_ih_l0.detach().numpy().T,
                        t_lstm.weight_hh_l0.detach().numpy().T], axis=0)
    b = (t_lstm.bias_ih_l0 + t_lstm.bias_hh_l0).detach().numpy()
    params = [{"w": jnp.asarray(w), "b": jnp.asarray(b)}]
    carry = jnp.stack([jnp.asarray(h0), jnp.asarray(c0)],
                      axis=1)[:, None]              # (N, 1, 2, h)
    out_j, new_carry = nets.lstm_apply(params, jnp.asarray(x), carry)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.squeeze(0).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_carry[:, 0, 1]),
                               c_t.squeeze(0).numpy(), atol=1e-5)


class MemoryCueEnv:
    """Memory-dependent task: a +-1 cue is OBSERVABLE ONLY on the first
    step of each episode; reward = cue * tanh(action) on every step. A
    memoryless policy earns ~0 on steps t>=1 (identical obs for both
    cues), so beating the 1/T_ep visible-step ceiling requires the LSTM
    to WRITE the cue into its carry — which only trains if gradients
    flow through time (full-window BPTT). Detects the single-step
    truncation regression that the PointEnv cannot."""

    num_envs = 64
    num_actions = 1
    obs_dim = 2
    ep_len = 8

    def reset(self, key):
        kc, key = jax.random.split(key)
        cue = jnp.sign(jax.random.normal(kc, (self.num_envs,)))
        state = {"cue": cue, "t": jnp.zeros(self.num_envs, jnp.int32),
                 "key": key}
        return state, self._obs(cue, state["t"])

    def _obs(self, cue, t):
        visible = (t == 0).astype(jnp.float32)
        return jnp.stack([cue * visible, jnp.ones_like(cue)], axis=-1)

    def step(self, state, actions):
        reward = state["cue"] * jnp.tanh(actions[:, 0])
        t = state["t"] + 1
        time_out = t >= self.ep_len
        done = time_out
        key, k = jax.random.split(state["key"])
        new_cue = jnp.where(
            done, jnp.sign(jax.random.normal(k, state["cue"].shape)),
            state["cue"])
        new_t = jnp.where(done, 0, t)
        tr = Transition(
            obs=self._obs(new_cue, new_t), privileged_obs=None,
            reward=reward, done=done, time_out=time_out, episode_sums={},
            episode_count=jnp.sum(done.astype(jnp.float32)),
            episode_length_sum=jnp.sum(t * done).astype(jnp.float32),
            terrain_level_mean=jnp.zeros(()),
            max_command_x=jnp.zeros(()),
            torques=jnp.zeros((1, self.num_envs)),
            feet_contact_z=jnp.zeros((0, self.num_envs)))
        return {"cue": new_cue, "t": new_t, "key": key}, tr


def test_recurrent_bptt_learns_memory_task():
    from legged_gym_tpu.rl import networks as nets

    env = MemoryCueEnv()
    pol = PolicyCfg(actor_hidden_dims=[32], critic_hidden_dims=[32],
                    rnn_type="lstm", rnn_hidden_size=16, rnn_num_layers=1)
    alg = AlgorithmCfg(num_mini_batches=2, learning_rate=5e-3,
                       desired_kl=0.03)
    ts = init_train_state(jax.random.PRNGKey(0), env.obs_dim,
                          env.num_actions, pol, alg)
    learn = jax.jit(make_learn_fn(env, pol, alg, num_steps=16))
    env_state, obs = env.reset(jax.random.PRNGKey(1))
    obs = (obs, nets.init_memory(env.num_envs, pol))

    for it in range(150):
        ts, env_state, obs, metrics = learn(ts, env_state, obs)
    r = float(metrics["mean_step_reward"])
    # memoryless ceiling: only 1 of ep_len steps sees the cue -> 1/8
    # (= 0.125); carrying the cue through the LSTM earns ~1.0
    assert r > 0.4, (
        f"memory task reward {r:.3f} <= memoryless ceiling — LSTM "
        f"gradients are not flowing through time (BPTT truncation)")


def test_timeout_bootstrap_changes_advantage():
    """With all rewards zero and positive values, a time_out step should
    inject gamma*V into the reward (rsl_rl bootstrap semantics)."""
    alg = AlgorithmCfg()
    value = np.ones((3, 2), np.float32)
    reward = np.zeros((3, 2), np.float32)
    time_out = np.zeros((3, 2), bool)
    time_out[1, 0] = True
    boot = reward + alg.gamma * value * time_out
    assert boot[1, 0] == np.float32(alg.gamma)
    assert boot.sum() == np.float32(alg.gamma)
