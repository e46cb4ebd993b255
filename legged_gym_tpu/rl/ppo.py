"""PPO, fully jitted: rollout (lax.scan over env.step) + GAE + clipped
surrogate update with adaptive-KL learning rate.

Functional re-design of the external rsl_rl package the reference trains
with (interface call sites: task_registry.py:38,160-167; hyperparameters:
legged_robot_config.py:212-247). Semantics mirrored:
- timeout bootstrapping: rewards += gamma * V(s) on time_out steps (the
  consumer of extras["time_outs"], legged_robot.py:191-193);
- GAE(gamma, lam) with advantage normalization over the whole batch;
- clipped surrogate + clipped value loss + entropy bonus;
- adaptive LR: KL(old||new) per minibatch, lr /= 1.5 above 2x desired_kl,
  lr *= 1.5 below 0.5x, clamped to [1e-5, 1e-2];
- one index permutation shared by all epochs (rsl_rl's
  mini_batch_generator), 5 epochs x 4 minibatches.

An entire training iteration is ONE XLA program: 24 env steps, the PPO
update, and metric reduction — no host round-trips.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from legged_gym_tpu.rl import networks as nets


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: dict
    opt_state: tuple
    lr: jnp.ndarray        # () adaptive learning rate
    key: jnp.ndarray       # PRNG key


def make_optimizer(alg):
    return optax.chain(
        optax.clip_by_global_norm(alg.max_grad_norm),
        optax.scale_by_adam(),
    )


def init_train_state(key, obs_dim, num_actions, policy_cfg, alg_cfg,
                     critic_obs_dim=None):
    kp, kt = jax.random.split(key)
    params = nets.init_actor_critic(kp, obs_dim, num_actions, policy_cfg,
                                    critic_obs_dim=critic_obs_dim)
    tx = make_optimizer(alg_cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      lr=jnp.asarray(alg_cfg.learning_rate),
                      key=kt)


def make_learn_fn(env, policy_cfg, alg_cfg, num_steps):
    """Returns jittable ``learn_iteration(train_state, env_state, obs)``
    -> (train_state, env_state, obs, metrics).

    With a recurrent policy (policy_cfg.rnn_type, rsl_rl's
    ActorCriticRecurrent), the carried ``obs`` is the pack
    (obs[, privileged_obs], memory) where memory holds the actor/critic
    LSTM carries ({'a','c'}, (N, L, 2, h)); hidden states reset on done.
    The update trains on full trajectory segments: minibatches split the
    ENV axis, and the loss re-scans the LSTM over all ``num_steps`` of
    the window from the stored window-start carry, resetting the carry
    at dones — BPTT through the whole rollout window, the same gradient
    rsl_rl's recurrent generator computes with padded trajectories (its
    saved_hidden_states seed each segment; segment boundaries = rollout
    window boundaries here since T is the rollout length)."""
    act = nets.activation_fn(policy_cfg.activation)
    tx = make_optimizer(alg_cfg)
    n_mb = alg_cfg.num_mini_batches
    n_ep = alg_cfg.num_learning_epochs
    recurrent = nets.is_recurrent(policy_cfg)
    # asymmetric critic: when the env produces privileged observations,
    # the carried obs is the pack (actor_obs, privileged_obs) and the
    # critic consumes the privileged half (rsl_rl's critic_obs routing,
    # on_policy_runner.py: obs vs privileged_obs)
    asym = getattr(env, "num_privileged_obs", None) is not None

    def learn_iteration(ts: TrainState, env_state, obs):
        key, k_roll, k_perm = jax.random.split(ts.key, 3)
        if recurrent:
            obs, memory = obs
        else:
            memory = None
        # pre-rollout LSTM carries: the update re-scans each minibatch's
        # trajectory window from these (per env), so gradients flow
        # through the full T steps (truncated only at the window start,
        # as in rsl_rl where saved_hidden_states seed each segment)
        mem_roll_start = memory

        def policy_step(carry, _):
            env_state, obs_pack, memory, key = carry
            obs = obs_pack[0] if asym else obs_pack
            cobs = obs_pack[1] if asym else obs_pack
            key, k_act = jax.random.split(key)
            if recurrent:
                mean, mem_a = nets.actor_mean_rnn(ts.params, obs, act,
                                                  memory["a"])
                std = jnp.broadcast_to(ts.params["std"], mean.shape)
                eps = jax.random.normal(k_act, mean.shape, mean.dtype)
                action = mean + std * eps
                logp = nets.gaussian_log_prob(action, mean, std)
                value, mem_c = nets.critic_value_rnn(ts.params, cobs, act,
                                                     memory["c"])
            else:
                action, logp, mean, std = nets.sample_action(
                    k_act, ts.params, obs, act)
                value = nets.critic_value(ts.params, cobs, act)
            env_state, tr = env.step(env_state, action)
            data = dict(obs=obs, action=action, logp=logp, mean=mean,
                        std=std, value=value, reward=tr.reward,
                        done=tr.done, time_out=tr.time_out,
                        ep_sums=tr.episode_sums, ep_count=tr.episode_count,
                        ep_len_sum=tr.episode_length_sum,
                        terrain_level=tr.terrain_level_mean,
                        max_command_x=tr.max_command_x)
            if asym:
                data["cobs"] = cobs
            if recurrent:
                # zero the carried state of envs that finished (rsl_rl
                # resets hidden states on dones); the update re-scans the
                # window from mem_roll_start, so per-step carries need
                # not be stored
                keep = (~tr.done).astype(mem_a.dtype)[:, None, None, None]
                memory = {"a": mem_a * keep, "c": mem_c * keep}
            new_pack = ((tr.obs, tr.privileged_obs) if asym else tr.obs)
            return (env_state, new_pack, memory, key), data

        (env_state, obs, memory, _), batch = jax.lax.scan(
            policy_step, (env_state, obs, memory, k_roll), None,
            length=num_steps)

        # --- timeout bootstrap + GAE ---
        if recurrent:
            last_value, _ = nets.critic_value_rnn(
                ts.params, obs[1] if asym else obs, act, memory["c"])
        else:
            last_value = nets.critic_value(
                ts.params, obs[1] if asym else obs, act)
        reward = batch["reward"] + (alg_cfg.gamma * batch["value"]
                                    * batch["time_out"])
        not_done = 1.0 - batch["done"].astype(reward.dtype)

        def gae_step(carry, xs):
            adv_next, v_next = carry
            r, v, nd = xs
            delta = r + alg_cfg.gamma * v_next * nd - v
            adv = delta + alg_cfg.gamma * alg_cfg.lam * nd * adv_next
            return (adv, v), adv

        (_, _), advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            (reward, batch["value"], not_done),
            reverse=True)
        returns = advantages + batch["value"]
        adv_norm = ((advantages - advantages.mean())
                    / (advantages.std() + 1e-8))

        # --- minibatching ---
        # MLP policy: flatten (T, N, ...) -> (T*N, ...) and permute once.
        # Recurrent policy: minibatches split the ENV axis and keep the
        # window time-major (T, N_mb, ...), so the loss can re-scan the
        # LSTM over the whole trajectory segment (rsl_rl's recurrent
        # generator trains on whole trajectories; per-sample recompute
        # from a stored carry would truncate BPTT to one step).
        t_len, n_env = reward.shape
        if recurrent:
            flat = {
                "obs": batch["obs"],
                "action": batch["action"],
                "logp": batch["logp"],
                "mean": batch["mean"],
                "std": batch["std"],
                "value": batch["value"],
                "returns": returns,
                "adv": adv_norm,
                "done": batch["done"].astype(reward.dtype),
            }
            if asym:
                flat["cobs"] = batch["cobs"]
            mb_size = n_env // n_mb
            perm = jax.random.permutation(k_perm, n_env)[: mb_size * n_mb]
        else:
            tn = t_len * n_env
            flat = {
                "obs": batch["obs"].reshape(tn, -1),
                "action": batch["action"].reshape(tn, -1),
                "logp": batch["logp"].reshape(tn),
                "mean": batch["mean"].reshape(tn, -1),
                "std": batch["std"].reshape(tn, -1),
                "value": batch["value"].reshape(tn),
                "returns": returns.reshape(tn),
                "adv": adv_norm.reshape(tn),
            }
            if asym:
                flat["cobs"] = batch["cobs"].reshape(tn, -1)
            mb_size = tn // n_mb
            perm = jax.random.permutation(k_perm, tn)[: mb_size * n_mb]
        mb_idx = perm.reshape(n_mb, mb_size)
        mb_idx = jnp.tile(mb_idx, (n_ep, 1))          # epochs reuse perm

        def loss_fn(params, mb):
            if recurrent:
                # scan the LSTM over the T-step window from the stored
                # window-start carry, resetting at dones exactly as the
                # rollout did -> full-window BPTT
                def time_step(carry, x):
                    ma, mc = carry
                    mean_t, ma = nets.actor_mean_rnn(params, x["obs"],
                                                     act, ma)
                    value_t, mc = nets.critic_value_rnn(
                        params, x["cobs"] if asym else x["obs"], act, mc)
                    keep = (1.0 - x["done"])[:, None, None, None]
                    return (ma * keep, mc * keep), (mean_t, value_t)

                xs = {"obs": mb["obs"], "done": mb["done"]}
                if asym:
                    xs["cobs"] = mb["cobs"]
                _, (mean, value) = jax.lax.scan(
                    time_step, (mb["mem_a0"], mb["mem_c0"]), xs)
            else:
                mean = nets.actor_mean(params, mb["obs"], act)
                value = nets.critic_value(
                    params, mb["cobs"] if asym else mb["obs"], act)
            std = jnp.broadcast_to(params["std"], mean.shape)
            logp = nets.gaussian_log_prob(mb["action"], mean, std)
            entropy = nets.gaussian_entropy(std)

            ratio = jnp.exp(logp - mb["logp"])
            s1 = -mb["adv"] * ratio
            s2 = -mb["adv"] * jnp.clip(ratio, 1.0 - alg_cfg.clip_param,
                                       1.0 + alg_cfg.clip_param)
            surrogate = jnp.maximum(s1, s2).mean()

            if alg_cfg.use_clipped_value_loss:
                v_clip = mb["value"] + jnp.clip(
                    value - mb["value"], -alg_cfg.clip_param,
                    alg_cfg.clip_param)
                v_loss = jnp.maximum(
                    jnp.square(value - mb["returns"]),
                    jnp.square(v_clip - mb["returns"])).mean()
            else:
                v_loss = jnp.square(value - mb["returns"]).mean()

            loss = (surrogate + alg_cfg.value_loss_coef * v_loss
                    - alg_cfg.entropy_coef * entropy.mean())
            kl = nets.gaussian_kl(mb["mean"], mb["std"], mean, std).mean()
            return loss, (surrogate, v_loss, kl)

        def mb_step(carry, idx):
            params, opt_state, lr = carry
            if recurrent:
                # env-axis gather: time-major windows + window-start
                # carries for the selected envs
                mb = {k: v[:, idx] for k, v in flat.items()}
                mb["mem_a0"] = mem_roll_start["a"][idx]
                mb["mem_c0"] = mem_roll_start["c"][idx]
            else:
                mb = {k: v[idx] for k, v in flat.items()}

            (loss, (s_loss, v_loss, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb)

            if alg_cfg.schedule == "adaptive" and alg_cfg.desired_kl > 0:
                lr = jnp.where(kl > alg_cfg.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl < alg_cfg.desired_kl / 2.0) & (kl > 0.0),
                               jnp.minimum(1e-2, lr * 1.5), lr)

            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, lr), (loss, s_loss, v_loss, kl)

        (params, opt_state, lr), (losses, s_losses, v_losses, kls) = \
            jax.lax.scan(mb_step, (ts.params, ts.opt_state, ts.lr), mb_idx)

        ep_count = jnp.sum(batch["ep_count"])
        metrics = {
            "loss": losses.mean(),
            "surrogate_loss": s_losses.mean(),
            "value_loss": v_losses.mean(),
            "kl": kls.mean(),
            "kl_max": kls.max(),
            "noise_std": jnp.mean(params["std"]),
            "lr": lr,
            "mean_step_reward": batch["reward"].mean(),
            "episode_count": ep_count,
            "mean_episode_length": (jnp.sum(batch["ep_len_sum"])
                                    / jnp.maximum(ep_count, 1.0)),
            "terrain_level": batch["terrain_level"][-1],
            "max_command_x": batch["max_command_x"][-1],
            "episode": {
                name: jnp.sum(sums) / jnp.maximum(ep_count, 1.0)
                for name, sums in batch["ep_sums"].items()},
        }
        new_ts = TrainState(params=params, opt_state=opt_state, lr=lr,
                            key=key)
        if recurrent:
            obs = (obs, memory)
        return new_ts, env_state, obs, metrics

    return learn_iteration
