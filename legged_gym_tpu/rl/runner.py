"""Host-side training runner (the rsl_rl ``OnPolicyRunner`` equivalent,
interface per task_registry.py:160-167 / train.py:43).

Everything hot is inside the jitted ``learn_iteration``; this class only
orchestrates: iteration loop, steps/s metering, checkpoint save/load
(orbax), TensorBoard-style scalar logging (plain JSONL + optional
tensorboardX if available), and inference-policy export.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.rl import networks as nets
from legged_gym_tpu.rl.ppo import (TrainState, init_train_state,
                                   make_learn_fn, make_optimizer)


class PPORunner:
    def __init__(self, env, train_cfg, log_dir=None, seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with an 'env' axis — env
        state shards across it and the jitted learn step runs SPMD
        (parallel/sharding.py); None = single chip."""
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        self.mesh = mesh
        seed = train_cfg.seed if seed is None else seed

        # ActorCriticRecurrent selection (reference runner
        # policy_class_name, legged_robot_config.py:241; LSTM memory per
        # policy rnn_* fields :221-224)
        if ("Recurrent" in getattr(train_cfg.runner, "policy_class_name",
                                   "ActorCritic")
                and train_cfg.policy.rnn_type is None):
            train_cfg.policy.rnn_type = "lstm"
        self.recurrent = nets.is_recurrent(train_cfg.policy)

        key = jax.random.PRNGKey(seed)
        k_ts, self.reset_key = jax.random.split(key)
        self.train_state = init_train_state(
            k_ts, env.obs_dim, env.num_actions, train_cfg.policy,
            train_cfg.algorithm,
            critic_obs_dim=getattr(env, "num_privileged_obs", None))
        self.learn_fn = jax.jit(make_learn_fn(
            env, train_cfg.policy, train_cfg.algorithm,
            train_cfg.runner.num_steps_per_env))
        self.env_state = None
        self.obs = None
        self.current_iteration = 0
        self._log_fh = None
        self._tb = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._log_fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir, flush_secs=10)
            except ImportError:
                pass  # JSONL remains the source of truth

    # ------------------------------------------------------------ learning

    def _ensure_env_state(self, init_at_random_ep_len=False):
        if self.env_state is None:
            self.env_state, self.obs = self.env.reset(self.reset_key)
            if getattr(self.env, "num_privileged_obs", None) is not None:
                # asymmetric critic: carry the (obs, privileged_obs) pack
                self.env_state, tr = self.env.step(
                    self.env_state,
                    jnp.zeros((self.env.num_envs, self.env.num_actions)))
                self.obs = (tr.obs, tr.privileged_obs)
            if self.recurrent:
                self.obs = (self.obs, nets.init_memory(
                    self.env.num_envs, self.cfg.policy))
            if self.mesh is not None:
                from legged_gym_tpu.parallel import (replicate,
                                                     shard_batch,
                                                     shard_env_state)
                self.env_state = shard_env_state(
                    self.env_state, self.mesh, self.env.num_envs)
                self.obs = shard_batch(self.obs, self.mesh)
                self.train_state = replicate(self.train_state, self.mesh)
            if init_at_random_ep_len:
                # reference train.py:43 randomizes initial episode
                # progress to decorrelate resets
                import dataclasses as dc
                n = self.env.num_envs
                lengths = jax.random.randint(
                    jax.random.fold_in(self.reset_key, 1), (n,), 0,
                    self.env.max_episode_length, jnp.int32)
                self.env_state = dc.replace(self.env_state,
                                            episode_length=lengths)

    def learn(self, num_iterations, init_at_random_ep_len=False):
        self._ensure_env_state(init_at_random_ep_len)
        steps_per_iter = (self.cfg.runner.num_steps_per_env
                          * self.env.num_envs)

        # Depth-1 pipelined metrics fetch. On this backend every
        # device->host read is a tunnel round trip and
        # block_until_ready is a no-op (bench.py note), so the old
        # per-leaf float(np.asarray(leaf)) fetch serialized ~25 round
        # trips against an otherwise-async dispatch stream — measured
        # 5.8 s/iter vs 72 ms/iter of actual compute at the go1-rough
        # 1920-env config (tools/profile_train_loop.py). Fix: dispatch
        # iteration i+1 BEFORE fetching iteration i's metrics (one
        # device_get for the whole dict), so the transfer overlaps the
        # next iteration's compute and the loop runs at compute speed.
        pending = None  # (iteration, device metrics, iteration wall time)

        def fetch_and_log(it, dev_metrics, dt):
            metrics = jax.tree.map(float, jax.device_get(dev_metrics))
            metrics["iteration"] = it
            metrics["steps_per_s"] = steps_per_iter / dt
            self._log(metrics, it)

        t_prev = time.time()
        for it in range(self.current_iteration,
                        self.current_iteration + num_iterations):
            self.train_state, self.env_state, self.obs, metrics = \
                self.learn_fn(self.train_state, self.env_state, self.obs)
            self.current_iteration = it + 1
            if pending is not None:
                # dispatch-to-dispatch delta = steady-state wall/iter
                # (the fetch below overlaps this iteration's compute)
                t_now = time.time()
                fetch_and_log(pending[0], pending[1], t_now - t_prev)
                t_prev = t_now
            pending = (it, metrics, None)
            if (self.log_dir is not None
                    and (it + 1) % self.cfg.runner.save_interval == 0):
                self.save(os.path.join(self.log_dir,
                                       f"model_{it + 1}.ckpt"))
        if pending is not None:
            fetch_and_log(pending[0], pending[1], time.time() - t_prev)
        if self.log_dir is not None:
            self.save(os.path.join(self.log_dir,
                                   f"model_{self.current_iteration}.ckpt"))

    def _log(self, metrics, it):
        if self._log_fh is not None:
            self._log_fh.write(json.dumps(metrics) + "\n")
            self._log_fh.flush()
        if self._tb is not None:
            # rsl_rl's tag layout (on_policy_runner.py log()) so existing
            # TensorBoard dashboards work unchanged
            w = self._tb
            for name, v in metrics.get("episode", {}).items():
                w.add_scalar(f"Episode/rew_{name}", v, it)
            w.add_scalar("Loss/value_function", metrics["value_loss"], it)
            w.add_scalar("Loss/surrogate", metrics["surrogate_loss"], it)
            w.add_scalar("Loss/learning_rate", metrics["lr"], it)
            w.add_scalar("Policy/mean_noise_std",
                         metrics.get("noise_std", 0.0), it)
            w.add_scalar("Perf/total_fps", metrics["steps_per_s"], it)
            w.add_scalar("Train/mean_reward",
                         metrics["mean_step_reward"], it)
            w.add_scalar("Train/mean_episode_length",
                         metrics.get("mean_episode_length", 0.0), it)
        if it % 10 == 0:
            ep = metrics.get("episode", {})
            track = ep.get("tracking_lin_vel", 0.0)
            print(f"it {it:5d} | {metrics['steps_per_s']:.0f} steps/s | "
                  f"rew/step {metrics['mean_step_reward']:.5f} | "
                  f"eplen {metrics.get('mean_episode_length', 0):.0f} | "
                  f"track {track:.3f} | kl {metrics['kl']:.4f} | "
                  f"lr {metrics['lr']:.2e}")

    # ---------------------------------------------------------- checkpoint

    def save(self, path):
        """Orbax checkpoint of (params, opt_state, lr, iteration) —
        the model_<it>.pt analog (reference save cadence
        legged_robot_config.py:248)."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckpt = {
            "params": self.train_state.params,
            "opt_state": self.train_state.opt_state,
            "lr": self.train_state.lr,
            "key": self.train_state.key,
            "iteration": self.current_iteration,
        }
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, ckpt, force=True)

    def load(self, path, load_optimizer=True):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        tmpl = {
            "params": self.train_state.params,
            "opt_state": self.train_state.opt_state,
            "lr": self.train_state.lr,
            "key": self.train_state.key,
            "iteration": 0,
        }
        # construct_restore_args pins each leaf's sharding to the
        # template's (current backend) — without it, checkpoints saved
        # on one backend (TPU) fail to restore on another (CPU host)
        restore_args = ocp.checkpoint_utils.construct_restore_args(tmpl)
        ckpt = ckptr.restore(os.path.abspath(path), item=tmpl,
                             restore_args=restore_args)
        ts = self.train_state
        self.train_state = TrainState(
            params=ckpt["params"],
            opt_state=ckpt["opt_state"] if load_optimizer else ts.opt_state,
            lr=jnp.asarray(ckpt["lr"]), key=jnp.asarray(ckpt["key"]))
        self.current_iteration = int(ckpt["iteration"])
        return ckpt

    # ----------------------------------------------------------- inference

    def get_inference_policy(self):
        """Deterministic jitted actor: obs (N, D) -> actions (N, na)
        (rsl_rl get_inference_policy equivalent, play.py:66).

        Recurrent policies return a STATEFUL callable holding the LSTM
        carry across calls with hidden reset on first use — the behavior
        of the reference's PolicyExporterLSTM (helpers.py:193-219:
        persistent hidden_state/cell_state buffers); call
        ``policy.reset_memory()`` between episodes."""
        act = nets.activation_fn(self.cfg.policy.activation)
        params = self.train_state.params
        if not self.recurrent:
            @jax.jit
            def policy(obs):
                return nets.actor_mean(params, obs, act)
            return policy

        cfg = self.cfg.policy

        @jax.jit
        def step(obs, carry):
            return nets.actor_mean_rnn(params, obs, act, carry)

        class _StatefulPolicy:
            def __init__(self):
                self.carry = None

            def reset_memory(self):
                self.carry = None

            def __call__(self, obs):
                if self.carry is None:
                    self.carry = nets.init_memory(obs.shape[0], cfg,
                                                  obs.dtype)["a"]
                action, self.carry = step(obs, self.carry)
                return action

        return _StatefulPolicy()

    def export_policy(self, path):
        """Serialize the actor for deployment (TorchScript-export analog,
        helpers.py:180-219 incl. the LSTM exporter): saves params + an
        apply spec as .npz. Recurrent actors additionally carry the LSTM
        stack (torch gate order i,f,g,o) and its shape spec."""
        params = jax.device_get(self.train_state.params)
        flat = {}
        for i, layer in enumerate(params["actor"]):
            flat[f"w{i}"] = np.asarray(layer["w"])
            flat[f"b{i}"] = np.asarray(layer["b"])
        flat["activation"] = np.asarray(self.cfg.policy.activation)
        if self.recurrent:
            for i, cell in enumerate(params["mem_a"]):
                flat[f"lstm_w{i}"] = np.asarray(cell["w"])
                flat[f"lstm_b{i}"] = np.asarray(cell["b"])
            flat["rnn_hidden_size"] = np.asarray(
                self.cfg.policy.rnn_hidden_size)
            flat["rnn_num_layers"] = np.asarray(
                self.cfg.policy.rnn_num_layers)
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        np.savez(path, **flat)
        return path
