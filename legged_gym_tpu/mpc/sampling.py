"""Model-predictive control over the same jitted physics the RL env uses
(the north-star extension beyond the reference; BASELINE.json configs 4-5).

Three planners, all pure functions suitable for jit / shard_map:
- MPPI: K noisy action sequences around a nominal, softmax(-cost/T)
  reweighting;
- CEM: elite refit of a diagonal Gaussian over sequences, n iterations;
- GradientMPC: Adam on the action sequence by differentiating THROUGH the
  physics rollout (possible because the dynamics are pure JAX — no
  equivalent exists in the reference's black-box PhysX pipeline).

Multi-chip: the sample axis K is batch-last everywhere, so sharding K
over a mesh makes the per-candidate rollouts chip-local; the only
cross-chip data is the (K,) cost vector whose softmax/top-k becomes an
all_gather + psum inserted by XLA.

The cost is built from the env's own reward terms (tracking rewards,
orientation/height shaping, termination contact — legged_robot.py:857-966
semantics) so PPO and MPC optimize the same objective.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 16             # policy steps to look ahead (0.32 s)
    num_samples: int = 1024       # K rollouts per solve
    noise_std: float = 0.3        # action-space exploration std
    temperature: float = 0.1      # MPPI softmax temperature
    cem_iters: int = 3
    cem_elite_frac: float = 0.1
    gd_iters: int = 8
    gd_lr: float = 0.05
    termination_cost: float = 100.0


def _tile_state(phys, k):
    """Broadcast a 1-env PhysicsState (batch-last, N=1) to K candidates."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, x.shape[:-1] + (k,)), phys)


class SamplingMPC:
    """MPPI / CEM planner bound to a LeggedEnv's engine + reward model."""

    differentiable = False      # GradientMPC needs d(rollout)/d(actions)

    def __init__(self, env, cfg: MPCConfig = MPCConfig(), method="mppi",
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with an 'env' axis — the K
        candidate-rollout axis (batch-last) shards over it, making each
        chip roll out K/n_devices candidates; the softmax/top-k over the
        (K,) cost vector becomes XLA-inserted collectives (module
        docstring). cfg.num_samples must divide by the mesh size."""
        self.env = env
        self.cfg = cfg
        self.method = method
        self.mesh = mesh
        if mesh is not None:
            n_dev = mesh.devices.size
            if cfg.num_samples % n_dev:
                raise ValueError(
                    f"num_samples {cfg.num_samples} must be divisible "
                    f"by mesh size {n_dev}")

    def _shard_k(self, x):
        """Constrain the last (K) axis of an array or pytree over the
        mesh's env axis (no-op without a mesh)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        def one(a):
            spec = P(*([None] * (a.ndim - 1) + ["env"]))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(self.mesh, spec))

        return jax.tree.map(one, x)

    # ---- rollout cost (pure) ----
    def rollout_cost(self, phys0, link_params, friction, commands, seqs,
                     contact_patch=None, anchors=None):
        """seqs: (H, na, K) action sequences; phys0 batched over K.
        Returns (K,) total cost. No resets: bad candidates accumulate the
        termination-contact penalty instead of teleporting.

        anchors: optional static-friction anchor carry (init_anchors
        layout, batched over K) for warm-start robots
        (cfg.sim.contact_warm_start) — without it the planner's internal
        model would use the creeping regularized-friction dynamics the
        anchors were introduced to fix, a plan/execute model mismatch on
        exactly the robots that need them (aliengo). Threaded through the
        horizon scan; the final carry is discarded (plans don't mutate
        the env).

        contact_patch: optional pre-extracted (ph (S,S,K), r0, c0)
        terrain window shared by every step of the horizon — all K
        candidates start from ONE robot state, so a single window around
        it covers the whole lookahead (horizon * dt * |v| << window
        radius) and the per-step per-candidate window extraction (the
        slowest primitive on this backend) drops out of the solve."""
        env = self.env
        dflt = jnp.asarray(env.default_dof_pos, jnp.float32)[:, None]
        lo = jnp.asarray(env.soft_dof_lower, jnp.float32)[:, None]
        hi = jnp.asarray(env.soft_dof_upper, jnp.float32)[:, None]
        term_idx = jnp.asarray(env.term_idx) if len(env.term_idx) else None
        sigma = env.cfg.rewards.tracking_sigma

        use_chain = getattr(env, "chain_engine", None) is not None
        # the Pallas mega-kernel has no VJP; GradientMPC differentiates
        # through the rollout, so it uses the (differentiable) chain twin
        use_pallas = (use_chain and not self.differentiable
                      and jax.default_backend() != "cpu")
        track_ws = (use_chain and anchors is not None
                    and env.chain_engine.cc.warm_start)

        def step(carry, a):
            phys, cost, anc = carry
            targets = jnp.clip(a * env.cfg.control.action_scale + dflt,
                               lo, hi)
            if track_ws:
                phys, _tau, contact_f, anc = \
                    env.chain_engine.step_decimation_pos(
                        phys, link_params, friction, targets,
                        use_pallas=use_pallas,
                        contact_patch=contact_patch, anchors=anc)
            elif use_chain:
                phys, _tau, contact_f = \
                    env.chain_engine.step_decimation_pos(
                        phys, link_params, friction, targets,
                        use_pallas=use_pallas,
                        contact_patch=contact_patch)
            else:
                patch = None
                if env.grid is not None:
                    from legged_gym_tpu.terrain.heightfield import \
                        extract_patches
                    patch = extract_patches(env.grid, phys.pos[0],
                                            phys.pos[1])

                def sim_body(p, _):
                    p, info = env.engine.step_pos_targets(
                        p, link_params, friction, targets, patch=patch)
                    return p, info

                phys, info = jax.lax.scan(sim_body, phys, None,
                                          length=env.cfg.control.decimation)
                contact_f = info.body_forces[-1]

            blv = phys.base_lin_vel()
            bav = phys.base_ang_vel()
            err_lin = jnp.sum(jnp.square(commands[:2, None] - blv[:2]),
                              axis=0)
            err_ang = jnp.square(commands[2, None] - bav[2])
            r = (jnp.exp(-err_lin / sigma)
                 + 0.5 * jnp.exp(-err_ang / sigma))
            c = -r * env.dt
            # flat-orientation and height shaping (orientation:869,
            # base_height:872 analogs)
            from legged_gym_tpu.ops import quat as quat_ops
            g = quat_ops.rotate_inverse(
                phys.quat, jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, -1.0])[:, None],
                    (3, phys.n)))
            c = c + 0.1 * jnp.sum(jnp.square(g[:2]), axis=0) * env.dt
            if term_idx is not None:
                bad = jnp.any(jnp.linalg.norm(
                    contact_f[:, term_idx], axis=0) > 1.0, axis=0)
                c = c + self.cfg.termination_cost * bad * env.dt
            return (phys, cost + c, anc), None

        k = seqs.shape[-1]
        cost0 = jnp.zeros(k, jnp.float32)
        anc0 = anchors if track_ws else None
        (phys, cost, _anc), _ = jax.lax.scan(
            step, (phys0, cost0, anc0), seqs)
        return cost

    def _shared_patch(self, phys_single, k):
        """One terrain window around the (single) start state, broadcast
        over the K candidates (see rollout_cost)."""
        env = self.env
        if env.grid is None or getattr(env, "chain_engine", None) is None:
            return None
        ce = env.chain_engine
        ph, r0, c0 = ce.extract_contact_patch(
            env.grid, phys_single.pos[0], phys_single.pos[1])
        return (jnp.broadcast_to(ph, ph.shape[:-1] + (k,)),
                jnp.broadcast_to(r0, (k,)), jnp.broadcast_to(c0, (k,)))

    def _anchors_k(self, anchors, k):
        """Broadcast an N=1 anchor carry (the env's CURRENT anchors, so
        the plan starts from the executed stance's stick state) over the
        K candidates; fresh sentinel anchors when none are supplied."""
        env = self.env
        ce = getattr(env, "chain_engine", None)
        if ce is None or not ce.cc.warm_start:
            return None
        if anchors is None or not isinstance(anchors, (list, tuple)):
            # no carry supplied, or the env stepped a general-engine
            # branch (stacked (3,P,N) layout — SEA/UniNet robots): the
            # chain rollout needs the per-group layout, start fresh
            return ce.init_anchors(k)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, a.shape[:-1] + (k,)), anchors)

    # ---- planners ----
    def plan(self, key, phys_single, link_params, friction, commands,
             nominal=None, anchors=None):
        """One MPC solve for a single robot state (N=1 slices of env
        state; anchors: the matching N=1 slice of EnvState.contact_ws
        for warm-start robots). Returns (action_seq (H, na), info)."""
        cfg = self.cfg
        h, na, k = cfg.horizon, self.env.num_actions, cfg.num_samples
        if nominal is None:
            nominal = jnp.zeros((h, na), jnp.float32)
        phys_k = self._shard_k(_tile_state(phys_single, k))
        lp_k = self._shard_k(jnp.broadcast_to(
            link_params, link_params.shape[:-1] + (k,)))
        fr_k = self._shard_k(jnp.broadcast_to(friction, (k,)))
        cpatch = self._shared_patch(phys_single, k)
        anc_k = self._anchors_k(anchors, k)

        if self.method == "mppi":
            noise = (jax.random.normal(key, (h, na, k)) * cfg.noise_std)
            seqs = self._shard_k(nominal[:, :, None] + noise)
            cost = self.rollout_cost(phys_k, lp_k, fr_k, commands, seqs,
                                     contact_patch=cpatch, anchors=anc_k)
            w = jax.nn.softmax(-cost / cfg.temperature)     # (K,)
            new_seq = jnp.sum(seqs * w[None, None, :], axis=-1)
            return new_seq, {"cost": jnp.sum(cost * w),
                             "best_cost": cost.min()}

        # CEM
        n_elite = max(1, int(k * cfg.cem_elite_frac))

        def cem_iter(carry, key_i):
            mean, std = carry
            noise = jax.random.normal(key_i, (h, na, k))
            seqs = self._shard_k(mean[:, :, None] + std[:, :, None] * noise)
            cost = self.rollout_cost(phys_k, lp_k, fr_k, commands, seqs,
                                     contact_patch=cpatch, anchors=anc_k)
            _, elite_idx = jax.lax.top_k(-cost, n_elite)
            elite = seqs[:, :, elite_idx]
            mean = elite.mean(axis=-1)
            std = elite.std(axis=-1) + 1e-3
            return (mean, std), cost.min()

        keys = jax.random.split(key, cfg.cem_iters)
        (mean, _), best = jax.lax.scan(
            cem_iter,
            (nominal, jnp.full((h, na), cfg.noise_std)), keys)
        return mean, {"best_cost": best[-1]}


class GradientMPC(SamplingMPC):
    """First-order trajectory optimization by differentiating through the
    rollout (pure-JAX physics is end-to-end differentiable)."""

    differentiable = True

    def plan(self, key, phys_single, link_params, friction, commands,
             nominal=None, anchors=None):
        cfg = self.cfg
        h, na = cfg.horizon, self.env.num_actions
        if nominal is None:
            nominal = jnp.zeros((h, na), jnp.float32)
        phys1 = phys_single
        lp = link_params
        fr = friction
        cpatch = self._shared_patch(phys_single, 1)
        anc1 = self._anchors_k(anchors, 1)

        def total_cost(seq):
            return self.rollout_cost(phys1, lp, fr, commands,
                                     seq[:, :, None],
                                     contact_patch=cpatch,
                                     anchors=anc1)[0]

        grad_fn = jax.value_and_grad(total_cost)

        def gd_step(carry, _):
            seq, m, v, t = carry
            c, g = grad_fn(seq)
            t = t + 1.0
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1.0 - 0.9 ** t)
            vh = v / (1.0 - 0.999 ** t)
            seq = seq - cfg.gd_lr * mh / (jnp.sqrt(vh) + 1e-8)
            return (seq, m, v, t), c

        (seq, _, _, _), costs = jax.lax.scan(
            gd_step,
            (nominal, jnp.zeros_like(nominal), jnp.zeros_like(nominal),
             jnp.zeros(())),
            None, length=cfg.gd_iters)
        return seq, {"cost_trace": costs, "best_cost": costs[-1]}
