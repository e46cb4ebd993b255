"""The locomotion environment: the reference's entire LeggedRobot task
(legged_robot.py:51-975) as ONE pure, jitted, shardable step function.

Architecture: host-side ``LeggedEnv.__init__`` compiles the robot model,
generates terrain, and precomputes every static array; ``step`` is a pure
function ``(EnvState, actions) -> (EnvState, Transition)`` — physics
(decimation x engine step), command logic, termination, all 21 reward
terms, masked resets, curricula, domain randomization, and observations,
with zero host<->device crossings. The training loop `lax.scan`s it.

Layout: internal tensors are batch-LAST (env axis in TPU vector lanes);
the policy boundary (obs / actions) is batch-first for MXU-friendly
(N, D) @ (D, H) matmuls.

Behavioral parity notes (quirks deliberately mirrored):
- obs after a reset mix pre-reset base velocities / heights with
  post-reset joint state (reference computes them before reset_idx,
  legged_robot.py:122-136);
- ``last_actions`` is always the previous step's actions — the zeroing in
  reset_idx:170 is dead code, overwritten at :136;
- timeout at episode_length > max (strict), i.e. 1001 steps of a "1000
  step" episode (check_termination:147);
- command resampling never fires on the step after reset because
  episode_length is incremented before the check (:119,341).
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu import assets
from legged_gym_tpu.model.robot import compile_model
from legged_gym_tpu.ops import quat as quat_ops
from legged_gym_tpu.physics.engine import Engine, SimConfig
from legged_gym_tpu.physics.params import (broadcast_nominal,
                                           link_params_from_scales)
from legged_gym_tpu.physics.state import PhysicsState
from legged_gym_tpu.terrain.heightfield import (PatchExtractor,
                                                TerrainPatch,
                                                patch_sample_min3,
                                                sample_min3)
from legged_gym_tpu.terrain.terrain import Terrain, TerrainGrid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Everything that evolves across steps, as one pytree (batch-last)."""
    physics: PhysicsState
    rng: jnp.ndarray                 # PRNG key
    episode_length: jnp.ndarray      # (N,) int32
    common_step: jnp.ndarray         # () int32 global step counter
    # cached per-env terrain window (refreshed every few steps — per-env
    # windowed reads are the slowest primitive on this backend, see
    # LeggedEnv.step; (N,1,1)/(N,) dummies when there is no heightfield)
    patch: jnp.ndarray               # (N, Sc, Sc) heights, meters
    patch_T: jnp.ndarray             # (Sc, Sc, N) same, kernel layout
    patch_r0: jnp.ndarray            # (N,) int32 window origin row
    patch_c0: jnp.ndarray            # (N,) int32 window origin col
    commands: jnp.ndarray            # (4, N) vx, vy, wz, heading
    actions: jnp.ndarray             # (na, N) current (clipped) actions
    last_actions: jnp.ndarray        # (na, N)
    last_dof_vel: jnp.ndarray        # (nq, N)
    feet_air_time: jnp.ndarray       # (nf, N)
    terrain_level: jnp.ndarray       # (N,) int32
    env_origin: jnp.ndarray          # (3, N)
    friction: jnp.ndarray            # (N,)
    mass_scales: jnp.ndarray         # (n_orig, N)
    link_params: jnp.ndarray         # (nl, 10, N) randomized inertias
    lin_vel_x_range: jnp.ndarray     # (2,) command-curriculum state
    episode_sums: dict               # name -> (N,)
    actuator_state: dict             # actuator-net recurrent state (or {})
    # warm-started contact forces (3, P, N) when
    # cfg.sim.contact_warm_start, else None (see contact.ContactConfig)
    contact_ws: object = None

    @property
    def n(self):
        return self.physics.n


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Transition:
    """Per-step outputs for the learner (batch-first at this boundary)."""
    obs: jnp.ndarray                 # (N, obs_dim)
    privileged_obs: object           # (N, priv_dim) or None (asymmetric
    #                                  critic inputs, base_task.py:70-78)
    reward: jnp.ndarray              # (N,)
    done: jnp.ndarray                # (N,) bool (term | timeout)
    time_out: jnp.ndarray            # (N,) bool
    # fixed-shape episode logging: per-term reward sums over envs that
    # finished this step + the count; the runner converts to means
    # (reference reset_idx extras, legged_robot.py:182-190)
    episode_sums: dict               # name -> () float
    episode_count: jnp.ndarray       # () float
    episode_length_sum: jnp.ndarray  # () float: sum of lengths of done eps
    terrain_level_mean: jnp.ndarray  # () float
    max_command_x: jnp.ndarray       # () float
    torques: jnp.ndarray             # (nq, N) applied joint torques
    feet_contact_z: jnp.ndarray      # (nf, N) vertical foot contact force


def _match_gains(dof_names, table, kind):
    out = np.zeros(len(dof_names))
    for i, name in enumerate(dof_names):
        hit = False
        for key, val in table.items():
            if key in name:
                out[i] = val
                hit = True
        if not hit:
            print(f"[legged_env] PD gain of joint {name} not in {kind} dict "
                  "-> 0 (reference legged_robot.py:700-707)")
    return out


class LeggedEnv:
    """Host-side constructor + pure step/reset methods.

    ``self`` holds only static (compile-time) data; every method that
    touches traced values is pure and safe under jit/vmap/shard_map.
    """

    def __init__(self, cfg, seed=0):
        self.cfg = cfg
        # TPU lane alignment: above one kernel chunk (1024) the fused
        # physics kernel tiles the env axis in 128-lane chunks, and
        # HBM-side padding per step costs more than simulating the extra
        # envs (measured: pad+slice fusions were 2.3 ms/step at 1800
        # envs). Round UP so every env is real; e.g. 1800 -> 1920.
        if (getattr(cfg.sim, "use_chain_engine", True)
                and cfg.env.num_envs > 1024 and cfg.env.num_envs % 128):
            rounded = -(-cfg.env.num_envs // 128) * 128
            print(f"[legged_gym_tpu] rounding num_envs "
                  f"{cfg.env.num_envs} -> {rounded} (128-lane alignment)")
            cfg.env.num_envs = rounded
        self.num_envs = cfg.env.num_envs
        self.dt = cfg.control.decimation * cfg.sim.dt     # policy dt
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(
            math.ceil(self.max_episode_length_s / self.dt))

        # --- robot model ---
        urdf = assets.resolve(cfg.asset.file)
        self.model = compile_model(
            urdf, collapse_fixed_joints=cfg.asset.collapse_fixed_joints,
            armature=cfg.asset.armature)
        m = self.model
        self.num_dof = m.nq
        self.num_actions = cfg.env.num_actions
        assert self.num_actions == m.nq, \
            f"num_actions {self.num_actions} != model dofs {m.nq}"

        # default joint angles (reference legged_robot.py:555-571)
        self.default_dof_pos = np.array(
            [cfg.init_state.default_joint_angles.get(n, 0.0)
             for n in m.dof_names])
        self.p_gains = _match_gains(m.dof_names, cfg.control.stiffness, "P")
        self.d_gains = _match_gains(m.dof_names, cfg.control.damping, "D")

        # hard + soft dof limits (_process_dof_props, legged_robot.py:284-310)
        self.dof_lower = np.asarray(m.dof_lower, float)
        self.dof_upper = np.asarray(m.dof_upper, float)
        mid = 0.5 * (self.dof_lower + self.dof_upper)
        rng_ = self.dof_upper - self.dof_lower
        soft = cfg.rewards.soft_dof_pos_limit
        self.soft_dof_lower = mid - 0.5 * rng_ * soft
        self.soft_dof_upper = mid + 0.5 * rng_ * soft
        self.dof_vel_limit = np.asarray(m.dof_vel_limit, float)
        self.torque_limit = np.asarray(m.dof_effort, float)

        # body index groups (legged_robot.py:684-690)
        self.feet_idx = np.array(m.match_bodies(cfg.asset.foot_name),
                                 dtype=np.int32)
        self.penal_idx = np.array(
            sum([m.match_bodies(s) for s in cfg.asset.penalize_contacts_on],
                []), dtype=np.int32)
        self.term_idx = np.array(
            sum([m.match_bodies(s)
                 for s in cfg.asset.terminate_after_contacts_on], []),
            dtype=np.int32)
        self.hip_idx = np.array(m.match_dofs("hip"), dtype=np.int32)

        # --- terrain ---
        mesh = cfg.terrain.mesh_type
        if mesh not in ("heightfield", "trimesh"):
            cfg.terrain.curriculum = False
        self.terrain = None
        self.grid: Optional[TerrainGrid] = None
        if mesh in ("heightfield", "trimesh"):
            self.terrain = Terrain(cfg.terrain, self.num_envs, seed=seed)
            self.grid = self.terrain.grid()
        self.custom_origins = mesh in ("heightfield", "trimesh")
        self._init_origins(seed)

        # --- engine ---
        self._warm_start = bool(getattr(cfg.sim, "contact_warm_start",
                                        False))
        simcfg = SimConfig(
            dt=cfg.sim.dt, substeps=cfg.sim.substeps,
            # asset.disable_gravity (Isaac asset option consumed at
            # load_asset, legged_robot.py:663-671): zero gravity for the
            # whole articulation; flows into the chain/Pallas fast path
            # too (ChainEngine reads engine.sim.gravity)
            gravity=((0.0, 0.0, 0.0) if cfg.asset.disable_gravity
                     else tuple(cfg.sim.gravity)),
            contact=dataclasses.replace(
                self._default_contact(),
                warm_start=self._warm_start,
                anchor_release_depth=getattr(
                    cfg.sim, "contact_anchor_release_depth", 0.005),
                terrain_friction=cfg.terrain.static_friction))
        # Isaac semantics: self_collisions == 0 ENABLES intra-actor
        # collision (bitwise filter, legged_robot.py:711-720); shipped
        # configs with 0: anymal_c_flat (anymal_c_flat_config.py:42)
        self._self_collision = cfg.asset.self_collisions == 0
        self.engine = Engine(self.model, simcfg, grid=self.grid,
                             kp=self.p_gains, kd=self.d_gains,
                             fixed_base=cfg.asset.fix_base_link,
                             lin_damping=cfg.asset.linear_damping,
                             ang_damping=cfg.asset.angular_damping,
                             self_collision=self._self_collision)
        self.engine.filter_self_collision_pairs(self.default_dof_pos)
        # numeric apparent-mass probe at the default pose: the implicit
        # contact law needs the true step-response mass — WITH the
        # implicit PD servo impedance for position-drive robots (else it
        # is many times too soft: 15 mm standing penetration observed),
        # WITHOUT it for torque-drive robots (SEA nets, V/T modes run
        # step_torques with passive impedance; probing with the servo
        # overestimates the mass and the over-corrected stopping impulse
        # micro-bounces the stance — measured on anymal)
        _sea_drive = (cfg.control.use_actuator_network
                      and not cfg.control.actuator_net_discard_output
                      and "lstm" in os.path.basename(
                          cfg.control.actuator_net_file))
        drive_kind = ("torque" if _sea_drive
                      or cfg.control.control_type in ("V", "T") else "pd")
        self.engine.calibrate_contact_mass(
            self.default_dof_pos,
            lambda n: broadcast_nominal(self.model, n, jnp.float32),
            drive=drive_kind)

        # fused chain-layout fast path (physics/chain_engine.py): Pallas
        # mega-kernel on TPU, plain-XLA twin on CPU. Supports the
        # anchored-static-friction carry (contact_warm_start) natively.
        self.chain_engine = None
        _fast_path_ok = not (self.engine.sc_pairs is not None
                             and len(self.engine.sc_pairs) > 0)
        if cfg.asset.linear_damping or cfg.asset.angular_damping:
            _fast_path_ok = False   # per-link drag wrenches: general
            #                         engine only (all shipped configs: 0)
        if getattr(cfg.sim, "use_chain_engine", True) and _fast_path_ok:
            try:
                from legged_gym_tpu.physics.chain_engine import ChainEngine
                self.chain_engine = ChainEngine(
                    self.engine, decimation=cfg.control.decimation,
                    patch_S=self.contact_patch_S,
                    plane_per_step=getattr(cfg.sim,
                                           "contact_plane_per_step", True))
                self.chain_engine.bind_grid(self.grid)
            except Exception as e:  # noqa: BLE001 — loud, typed fallback
                import logging
                logging.getLogger("legged_gym_tpu").warning(
                    "ChainEngine fast path unavailable for this robot "
                    "(%s: %s); falling back to the general stacked "
                    "engine (slower, same semantics).",
                    type(e).__name__, e)
                self.chain_engine = None

        # --- height scan (legged_robot.py:802-816) ---
        self.measure_heights = (cfg.terrain.measure_heights
                                and mesh != "none")
        px = np.asarray(cfg.terrain.measured_points_x)
        py = np.asarray(cfg.terrain.measured_points_y)
        gx, gy = np.meshgrid(px, py, indexing="ij")
        self.height_points = np.stack(
            [gx.ravel(), gy.ravel()])            # (2, P) base-frame xy
        self.num_height_points = self.height_points.shape[1]

        # --- observation bookkeeping ---
        s = cfg.normalization.obs_scales
        self.obs_scales = s
        self.commands_scale = np.array(
            [s["lin_vel"], s["lin_vel"], s["ang_vel"]])
        self.obs_dim = 9 + 3 + 2 * m.nq + self.num_actions
        if self.measure_heights:
            self.obs_dim += self.num_height_points
        assert self.obs_dim == cfg.env.num_observations, \
            f"obs dim {self.obs_dim} != cfg {cfg.env.num_observations}"
        self.noise_vec = self._build_noise_vec()

        # privileged observations for an asymmetric critic (the VecEnv
        # privileged_obs contract, base_task.py:70-78,101-110; the
        # reference allocates the buffer but ships no producer — here the
        # layout is: noiseless obs + ground friction + base-mass scale +
        # feet contact forces)
        self.num_privileged_obs = None
        if cfg.env.num_privileged_obs is not None:
            expect = self.obs_dim + 2 + 3 * len(self.feet_idx)
            if cfg.env.num_privileged_obs != expect:
                raise ValueError(
                    f"num_privileged_obs={cfg.env.num_privileged_obs} but "
                    f"the privileged layout for this robot has {expect} "
                    f"dims (obs {self.obs_dim} + friction 1 + base-mass 1 "
                    f"+ 3x{len(self.feet_idx)} feet forces)")
            self.num_privileged_obs = expect

        # --- rewards (reflection over nonzero scales,
        #     legged_robot.py:574-598; scales x dt) ---
        self.reward_scales = {}
        for name, scale in cfg.rewards.scales.items():
            if scale != 0.0:
                self.reward_scales[name] = scale * self.dt
        self.reward_names = [n for n in self.reward_scales
                             if n != "termination"]

        # command resample / push cadence (legged_robot.py:770-779)
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)
        self.push_interval = int(
            math.ceil(cfg.domain_rand.push_interval_s / self.dt))

        # actuator networks (anymal.py:52-55, go1.py:44-47). With the
        # reference's discard quirk active (see config.ControlCfg), the
        # UniNet output never affects dynamics, so we skip its compute.
        self._sea = None
        self._uninet = None
        if (cfg.control.use_actuator_network
                and not cfg.control.actuator_net_discard_output):
            net_file = assets.resolve(cfg.control.actuator_net_file)
            if "lstm" in os.path.basename(net_file):
                from legged_gym_tpu.actuators.sea_lstm import SEANet
                self._sea = SEANet(net_file)
            else:
                from legged_gym_tpu.actuators.uninet import UniNet
                self._uninet = UniNet(net_file)
        # which step() branch runs the physics decides the anchor-carry
        # LAYOUT: the fused chain path takes per-group (3,S,K,N) arrays,
        # every general-engine branch (UniNet torque drive, V/T,
        # stacked-P) takes one stacked (3,P,N) array. SEA robots use the
        # fused torque path (step_decimation_torque_fn) when the chain
        # engine built.
        self._chain_path = (self.chain_engine is not None
                            and self._uninet is None
                            and (self._sea is not None
                                 or cfg.control.control_type == "P"))

        self.dtype = jnp.float32

    def _init_actuator_state(self, n):
        if self._sea is not None:
            h, c = self._sea.init_state(self.num_dof * n, self.dtype)
            shape = (2, self._sea.hidden, self.num_dof, n)
            return {"h": h.reshape(shape), "c": c.reshape(shape)}
        if self._uninet is not None:
            return self._uninet.init_state(n, self.dtype)
        return {}

    @staticmethod
    def _default_contact():
        from legged_gym_tpu.physics.contact import ContactConfig
        return ContactConfig()

    def _init_origins(self, seed):
        """Spawn origins (reference _get_env_origins, legged_robot.py:742-767)."""
        n = self.num_envs
        rng = np.random.default_rng(seed + 1)
        if self.custom_origins:
            tcfg = self.cfg.terrain
            max_init = min(tcfg.max_init_terrain_level, tcfg.num_rows - 1)
            if not tcfg.curriculum:
                max_init = tcfg.num_rows - 1
            self.init_terrain_levels = rng.integers(
                0, max_init + 1, size=n).astype(np.int32)
            self.terrain_types = (np.arange(n) //
                                  (n / tcfg.num_cols)).astype(np.int32)
            self.max_terrain_level = tcfg.num_rows
            self.terrain_origins = self.terrain.env_origins  # (rows, cols, 3)
            origins = self.terrain_origins[
                self.init_terrain_levels, self.terrain_types]
        else:
            self.init_terrain_levels = np.zeros(n, dtype=np.int32)
            self.terrain_types = np.zeros(n, dtype=np.int32)
            self.max_terrain_level = 1
            self.terrain_origins = np.zeros((1, max(n, 1), 3))
            cols = int(np.floor(np.sqrt(n)))
            rows = int(np.ceil(n / cols))
            xx, yy = np.meshgrid(np.arange(rows), np.arange(cols),
                                 indexing="ij")
            sp = self.cfg.env.env_spacing
            origins = np.zeros((n, 3))
            origins[:, 0] = sp * xx.ravel()[:n]
            origins[:, 1] = sp * yy.ravel()[:n]
        self.init_env_origins = origins.T                    # (3, N)

        # ---- terrain patch cache setup ----
        # Per-env windowed reads (vmap'd dynamic_slice) execute as a
        # sequential per-env loop on this backend (~1 us per env per
        # step: 2.4 of 3.2 ms/step at 1920 envs, measured with
        # jax.profiler). So the env keeps a larger (Sc x Sc) window in
        # its STATE, refreshed only every `patch_refresh` steps, with a
        # per-terrain-cell static window swapped in for reset envs via a
        # one-hot matmul (no gathers).
        self.patch_cache_S = 40          # 4.0 m: scan +-0.95 m, reset
        #                                  offset +-1 m, drift margin
        self.patch_refresh = 4           # steps between re-extractions
        self._patch_extractor = None
        # contact window passed to the physics kernel: center crop of the
        # cache (VMEM budget). +-1.2 m covers reach + drift for walking
        # envs; freshly reset envs (up to +-1 m off window center) may
        # clamp on the outer band for <= patch_refresh-1 steps.
        self.contact_patch_S = 24
        if self.grid is not None:
            Sc = self.patch_cache_S
            self._patch_extractor = PatchExtractor(self.grid, size=Sc)
            G = np.asarray(self.grid.height, np.float32)
            R, C = G.shape
            hs = self.grid.horizontal_scale
            border = self.grid.border_size
            org = np.asarray(self.terrain_origins, float).reshape(-1, 3)
            r0s = np.clip(((org[:, 0] + border) / hs).astype(np.int32)
                          - Sc // 2, 0, R - Sc)
            c0s = np.clip(((org[:, 1] + border) / hs).astype(np.int32)
                          - Sc // 2, 0, C - Sc)
            self._cell_patches = np.stack(
                [G[r:r + Sc, c:c + Sc].reshape(-1)
                 for r, c in zip(r0s, c0s)])         # (n_cells, Sc*Sc)
            self._cell_r0 = r0s.astype(np.float32)
            self._cell_c0 = c0s.astype(np.float32)
            self._n_cells = len(r0s)
            self._cells_ncols = np.asarray(self.terrain_origins).shape[1]

    def _env_cells(self, terrain_level):
        """(N,) flat terrain-cell index per env."""
        types = jnp.asarray(self.terrain_types)
        return terrain_level * self._cells_ncols + types

    def _cell_patch_lookup(self, cells):
        """Static origin-centered windows per env by cell index, via a
        one-hot matmul (per-env gathers are pathologically slow here).
        Returns (patch (N, Sc, Sc), patch_T (Sc, Sc, N), r0, c0)."""
        Sc = self.patch_cache_S
        cp = jnp.asarray(self._cell_patches, self.dtype)
        onehot = (cells[:, None]
                  == jnp.arange(self._n_cells)[None, :]).astype(self.dtype)
        ph = (onehot @ cp).reshape(-1, Sc, Sc)
        ph_T = (cp.T @ onehot.T).reshape(Sc, Sc, -1)
        r0 = (onehot @ jnp.asarray(self._cell_r0, self.dtype)
              ).astype(jnp.int32)
        c0 = (onehot @ jnp.asarray(self._cell_c0, self.dtype)
              ).astype(jnp.int32)
        return ph, ph_T, r0, c0

    def _build_noise_vec(self):
        """Additive-noise scale per obs slot (_get_noise_scale_vec,
        legged_robot.py:477-500)."""
        cfg = self.cfg
        ns, s = cfg.noise.noise_scales, cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        nq, na = self.num_dof, self.num_actions
        v = np.zeros(self.obs_dim)
        v[0:3] = ns["lin_vel"] * lvl * s["lin_vel"]
        v[3:6] = ns["ang_vel"] * lvl * s["ang_vel"]
        v[6:9] = ns["gravity"] * lvl
        v[9:12] = 0.0                                   # commands
        v[12:12 + nq] = ns["dof_pos"] * lvl * s["dof_pos"]
        v[12 + nq:12 + 2 * nq] = ns["dof_vel"] * lvl * s["dof_vel"]
        v[12 + 2 * nq:12 + 2 * nq + na] = 0.0           # previous actions
        if self.measure_heights:
            v[12 + 2 * nq + na:] = (ns["height_measurements"] * lvl
                                    * s["height_measurements"])
        return v

    # ------------------------------------------------------------- resets

    def _draw_friction(self, key, n):
        """64-bucket friction randomization (reference quirk,
        legged_robot.py:259-282)."""
        dr = self.cfg.domain_rand
        if not dr.randomize_friction:
            return jnp.full((n,), self.cfg.terrain.static_friction,
                            self.dtype)
        kb, ka = jax.random.split(key)
        lo, hi = dr.friction_range
        buckets = jax.random.uniform(kb, (dr.num_friction_buckets,),
                                     self.dtype, lo, hi)
        idx = jax.random.randint(ka, (n,), 0, dr.num_friction_buckets)
        return buckets[idx]

    def _draw_mass_scales(self, key, n):
        """Per-original-body mass scales: base + U(added_mass_range) kg,
        limbs x (1 + U(added_limb_percentage))
        (_process_rigid_body_props, legged_robot.py:312-335)."""
        dr = self.cfg.domain_rand
        m = self.model
        kb, kl = jax.random.split(key)
        scales = jnp.ones((m.n_orig, n), self.dtype)
        if dr.randomize_base_mass:
            base_mass = float(
                m.contrib[m.orig_is_base, 0].sum())
            add = jax.random.uniform(kb, (n,), self.dtype,
                                     dr.added_mass_range[0],
                                     dr.added_mass_range[1])
            base_scale = 1.0 + add / max(base_mass, 1e-9)
            is_base = jnp.asarray(m.orig_is_base)[:, None]
            scales = jnp.where(is_base, base_scale[None, :], scales)
        if dr.randomize_limb_mass:
            mult = 1.0 + jax.random.uniform(
                kl, (m.n_orig, n), self.dtype,
                dr.added_limb_percentage[0], dr.added_limb_percentage[1])
            is_base = jnp.asarray(m.orig_is_base)[:, None]
            scales = jnp.where(is_base, scales, scales * mult)
        return scales

    def _link_params(self, mass_scales, n):
        dr = self.cfg.domain_rand
        if dr.randomize_base_mass or dr.randomize_limb_mass:
            return link_params_from_scales(self.model, mass_scales,
                                           self.dtype)
        return broadcast_nominal(self.model, n, self.dtype)

    def _draw_reset_physics(self, key, origins):
        """Fresh physics state for every env (selected by mask at reset):
        dofs = default x U(0.5, 1.5), qd = 0 (_reset_dofs:399-413);
        root at origin (+-1 m xy on terrain), world vel U(-0.5, 0.5)
        (_reset_root_states:414-434)."""
        n = origins.shape[-1]
        kq, kxy, kv = jax.random.split(key, 3)
        ist = self.cfg.init_state
        rng_lo, rng_hi = getattr(ist, "dof_spawn_range", (0.5, 1.5))
        q = (jnp.asarray(self.default_dof_pos, self.dtype)[:, None]
             * jax.random.uniform(kq, (self.num_dof, n), self.dtype,
                                  rng_lo, rng_hi))
        pos = origins + jnp.asarray(ist.pos, self.dtype)[:, None]
        if self.custom_origins:
            dxy = jax.random.uniform(kxy, (2, n), self.dtype, -1.0, 1.0)
            pos = pos.at[:2].add(dxy)
        quat = jnp.broadcast_to(
            jnp.asarray(ist.rot, self.dtype)[:, None], (4, n))
        # reference _reset_root_states OVERWRITES root velocity with the
        # U(-0.5, 0.5) draw (root_states[env_ids, 7:13] = rand); init_state
        # velocities only matter for the very first spawn there.
        sv = float(getattr(ist, "spawn_vel", 0.5))
        base_vel = jax.random.uniform(kv, (6, n), self.dtype, -sv, sv)
        pos = self._depenetrate_spawn(pos, quat, q)
        return PhysicsState.from_world_vel(
            pos=pos, quat=quat, lin_vel_w=base_vel[:3],
            ang_vel_w=base_vel[3:], q=q,
            qd=jnp.zeros((self.num_dof, n), self.dtype))

    def _depenetrate_spawn(self, pos, quat, q):
        """Lift the drawn base so no collision point starts underground.

        Configs inherit spawn heights tuned for PhysX's overlap
        resolution (e.g. aliengo: init z=0.32 puts the default-pose FEET
        160 mm underground; legged_robot_config.py pos + PhysX
        depenetration). PhysX resolves initial overlap with bounded
        position correction; a velocity-level pushout instead converts
        it into a violent launch that flings legs (observed: aliengo
        thigh driven to q=3.2 rad against the 44 Nm torque limit every
        reset). One FK on the drawn pose computes the exact lift; ground
        height is sampled at the base xy (exact on plane/flat cells,
        conservative near steps since origins use the cell-center max,
        terrain.py:158-164)."""
        if self.cfg.asset.fix_base_link or len(self.model.cp_link) == 0:
            return pos
        from legged_gym_tpu.physics.kinematics import (
            contact_point_kinematics, forward_kinematics)
        from legged_gym_tpu.terrain.heightfield import sample_bilinear

        n = pos.shape[-1]
        probe = PhysicsState(pos=pos, quat=quat,
                             vel=jnp.zeros((6, n), self.dtype), q=q,
                             qd=jnp.zeros((self.num_dof, n), self.dtype))
        cp_pos, _ = contact_point_kinematics(
            self.model, forward_kinematics(self.model, probe))
        ground, _, _ = sample_bilinear(self.grid, pos[0], pos[1])
        clearance = jnp.min(
            cp_pos[2] - jnp.asarray(self.model.cp_radius,
                                    self.dtype)[:, None], axis=0) - ground
        lift = jnp.maximum(0.005 - clearance, 0.0)
        return pos.at[2].add(lift)

    def _resample_commands(self, key, commands, mask):
        """New commands where mask (reference _resample_commands:353-368)."""
        cfg = self.cfg.commands
        k1, k2, k3 = jax.random.split(key, 3)
        n = commands.shape[-1]
        r = cfg.ranges
        new = commands
        vx = jax.random.uniform(k1, (n,), self.dtype)  # scaled below by
        # the (curriculum-widened) range held in env state
        vy = jax.random.uniform(k2, (n,), self.dtype,
                                r["lin_vel_y"][0], r["lin_vel_y"][1])
        new = new.at[1].set(jnp.where(mask, vy, commands[1]))
        if cfg.heading_command:
            h = jax.random.uniform(k3, (n,), self.dtype,
                                   r["heading"][0], r["heading"][1])
            new = new.at[3].set(jnp.where(mask, h, commands[3]))
        else:
            w = jax.random.uniform(k3, (n,), self.dtype,
                                   r["ang_vel_yaw"][0], r["ang_vel_yaw"][1])
            new = new.at[2].set(jnp.where(mask, w, commands[2]))
        return new, vx

    def _apply_vx_and_deadband(self, commands, vx_unit, lin_vel_x_range,
                               mask):
        lo, hi = lin_vel_x_range[0], lin_vel_x_range[1]
        vx = lo + (hi - lo) * vx_unit
        new = commands.at[0].set(jnp.where(mask, vx, commands[0]))
        # zero-out small commands (legged_robot.py:367-368)
        small = jnp.sqrt(new[0] ** 2 + new[1] ** 2) <= 0.2
        kill = mask & small
        new = new.at[0].set(jnp.where(kill, 0.0, new[0]))
        new = new.at[1].set(jnp.where(kill, 0.0, new[1]))
        return new

    # ------------------------------------------------------------ reset()

    def initial_state(self, key) -> EnvState:
        """State after the global reset (reference BaseTask.reset:111-115;
        the caller should run one zero-action step to populate obs)."""
        n = self.num_envs
        key, kf, km, kp, kc, kcx = jax.random.split(key, 6)
        friction = self._draw_friction(kf, n)
        mass_scales = self._draw_mass_scales(km, n)
        origins = jnp.asarray(self.init_env_origins, self.dtype)
        physics = self._draw_reset_physics(kp, origins)
        r = self.cfg.commands.ranges
        lin_vel_x_range = jnp.asarray(r["lin_vel_x"], self.dtype)
        commands = jnp.zeros((4, n), self.dtype)
        ones = jnp.ones(n, bool)
        commands, vx_unit = self._resample_commands(kc, commands, ones)
        commands = self._apply_vx_and_deadband(commands, vx_unit,
                                               lin_vel_x_range, ones)
        if self.grid is not None:
            lvl = jnp.asarray(self.init_terrain_levels)
            patch0, patch0_T, pr0, pc0 = self._cell_patch_lookup(
                self._env_cells(lvl))
        else:
            patch0 = jnp.zeros((n, 1, 1), self.dtype)
            patch0_T = jnp.zeros((1, 1, n), self.dtype)
            pr0 = pc0 = jnp.zeros((n,), jnp.int32)
        return EnvState(
            physics=physics, rng=key,
            episode_length=jnp.zeros(n, jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            patch=patch0, patch_T=patch0_T, patch_r0=pr0, patch_c0=pc0,
            commands=commands,
            actions=jnp.zeros((self.num_actions, n), self.dtype),
            last_actions=jnp.zeros((self.num_actions, n), self.dtype),
            last_dof_vel=jnp.zeros((self.num_dof, n), self.dtype),
            feet_air_time=jnp.zeros((len(self.feet_idx), n), self.dtype),
            terrain_level=jnp.asarray(self.init_terrain_levels),
            env_origin=origins,
            friction=friction, mass_scales=mass_scales,
            link_params=self._link_params(mass_scales, n),
            lin_vel_x_range=lin_vel_x_range,
            episode_sums={name: jnp.zeros(n, self.dtype)
                          for name in self.reward_scales},
            actuator_state=self._init_actuator_state(n),
            contact_ws=self._init_contact_ws(n),
        )

    def _init_contact_ws(self, n):
        """Static-friction anchor carry: chain-layout group list on the
        fast path, stacked (3, P, N) on the general engine, None when
        warm start is off."""
        if not self._warm_start:
            return None
        if self._chain_path:
            return self.chain_engine.init_anchors(n, self.dtype)
        from legged_gym_tpu.physics.contact import ANCHOR_SENTINEL
        return jnp.full((3, len(self.model.cp_link), n), ANCHOR_SENTINEL,
                        self.dtype)

    def reset(self, key):
        """(state, obs): global reset + one zero-action step (reference
        BaseTask.reset semantics)."""
        state = self.initial_state(key)
        zeros = jnp.zeros((self.num_envs, self.num_actions), self.dtype)
        state, tr = self.step(state, zeros)
        return state, tr.obs

    # -------------------------------------------------------------- step()

    def step(self, state: EnvState, actions) -> tuple:
        """One policy step. actions: (N, num_actions). Pure; jit/scan me."""
        cfg = self.cfg
        n = state.n
        clip_a = cfg.normalization.clip_actions
        a = jnp.clip(actions.T.astype(self.dtype), -clip_a, clip_a)

        rng, k_cmd, k_push, k_noise, k_reset, k_dr, k_lvl = \
            jax.random.split(state.rng, 7)

        # Cached per-env terrain window: per-env windowed extraction is
        # the slowest primitive on this backend (a sequential per-env
        # dynamic-slice loop, ~2.4 ms/step at 1920 envs), so the window
        # lives in the STATE and is re-extracted only every
        # `patch_refresh` steps; reset envs get a static origin-centered
        # window (one-hot matmul) below. The 4 m window covers the scan
        # radius, reset offsets, and several steps of drift.
        patch = None
        contact_patch = None
        if self.grid is not None:
            refresh = (state.common_step % self.patch_refresh) == 0

            def _do_refresh(_):
                tp = self._patch_extractor(state.physics.pos[0],
                                           state.physics.pos[1])
                return tp.h, jnp.transpose(tp.h, (1, 2, 0)), tp.r0, tp.c0

            def _keep(_):
                return (state.patch, state.patch_T, state.patch_r0,
                        state.patch_c0)

            ph_c, ph_T, pr0, pc0 = jax.lax.cond(refresh, _do_refresh,
                                                _keep, None)
            patch = TerrainPatch(h=ph_c, r0=pr0, c0=pc0)
            lo = (self.patch_cache_S - self.contact_patch_S) // 2
            hi = lo + self.contact_patch_S
            contact_patch = (ph_T[lo:hi, lo:hi], pr0 + lo, pc0 + lo)

        # ---- actuation + decimation x sim (legged_robot.py:89-99) ----
        ctrl = cfg.control.control_type
        nq = self.num_dof
        dflt = jnp.asarray(self.default_dof_pos, self.dtype)[:, None]
        if self._sea is not None:
            # SEA torque drive (anymal.py:71-81): net input per sim dt =
            # (pos target - q, qd); LSTM state advances per sim dt. The
            # static-friction anchor carry rides the decimation scan when
            # contact_warm_start is on (ANYmal's 80 N*m/rad drive cannot
            # hold its 52 kg stance against regularized-friction creep:
            # feet slide out, HAA splays ~0.3 rad, shanks ground and the
            # collision penalty zero-clips every reward).
            targets = a * cfg.control.action_scale + dflt

            def sea_tau(q, qd, act):
                pos_err = (targets - q).reshape(nq * n)
                tau, (h, c) = self._sea(
                    pos_err, qd.reshape(nq * n),
                    (act["h"].reshape(2, -1, nq * n),
                     act["c"].reshape(2, -1, nq * n)))
                act = {"h": h.reshape(act["h"].shape),
                       "c": c.reshape(act["c"].shape)}
                return tau.reshape(nq, n), act

            if self.chain_engine is not None:
                # fused SEA path: physics segments in the Pallas/chain
                # kernel, LSTM matmuls between them — one XLA program
                use_pallas = jax.default_backend() != "cpu"
                out = self.chain_engine.step_decimation_torque_fn(
                    state.physics, state.link_params, state.friction,
                    sea_tau, state.actuator_state,
                    use_pallas=use_pallas, contact_patch=contact_patch,
                    anchors=state.contact_ws if self._warm_start
                    else None)
                if self._warm_start:
                    (physics, torques_d, contact_f_d, actuator_state,
                     contact_ws) = out
                else:
                    physics, torques_d, contact_f_d, actuator_state = out
                    contact_ws = state.contact_ws
                infos = None
            else:
                def sim_body(carry, _):
                    phys, act, ws = carry
                    tau, act = sea_tau(phys.q, phys.qd, act)
                    if self._warm_start:
                        phys, info, ws = self.engine.step_torques(
                            phys, state.link_params, state.friction,
                            tau, patch=patch, f_ws=ws)
                    else:
                        phys, info = self.engine.step_torques(
                            phys, state.link_params, state.friction,
                            tau, patch=patch)
                    return (phys, act, ws), info

                (physics, actuator_state, contact_ws), infos = \
                    jax.lax.scan(
                        sim_body, (state.physics, state.actuator_state,
                                   state.contact_ws),
                        None, length=cfg.control.decimation)
        elif ctrl == "P":
            targets = jnp.clip(
                a * cfg.control.action_scale + dflt,
                jnp.asarray(self.soft_dof_lower, self.dtype)[:, None],
                jnp.asarray(self.soft_dof_upper, self.dtype)[:, None])

            if self._uninet is not None:
                # applied-UniNet extension (reference discards the output,
                # go1.py:68-76): dVel feeds the PD damping term as a
                # velocity target
                kp = jnp.asarray(self.p_gains, self.dtype)[:, None]
                kd = jnp.asarray(self.d_gains, self.dtype)[:, None]
                lim = jnp.asarray(self.torque_limit, self.dtype)[:, None]

                def sim_body(carry, _):
                    phys, act, ws = carry
                    dvel, act = self._uninet(targets, phys.q, phys.qd, act)
                    tau = jnp.clip(kp * (targets - phys.q)
                                   - kd * (phys.qd - dvel), -lim, lim)
                    if self._warm_start:
                        phys, info, ws = self.engine.step_torques(
                            phys, state.link_params, state.friction, tau,
                            patch=patch, f_ws=ws)
                    else:
                        phys, info = self.engine.step_torques(
                            phys, state.link_params, state.friction, tau,
                            patch=patch)
                    return (phys, act, ws), info

                (physics, actuator_state, contact_ws), infos = \
                    jax.lax.scan(
                        sim_body, (state.physics, state.actuator_state,
                                   state.contact_ws),
                        None, length=cfg.control.decimation)
            elif self.chain_engine is not None:
                # fused chain path: the whole decimation loop is one
                # program (Pallas mega-kernel on TPU)
                use_pallas = jax.default_backend() != "cpu"
                out = self.chain_engine.step_decimation_pos(
                    state.physics, state.link_params, state.friction,
                    targets, use_pallas=use_pallas,
                    contact_patch=contact_patch,
                    anchors=state.contact_ws if self._warm_start
                    else None)
                if self._warm_start:
                    physics, torques_d, contact_f_d, contact_ws = out
                else:
                    physics, torques_d, contact_f_d = out
                infos = None
                actuator_state = state.actuator_state
            elif self._warm_start:
                def sim_body(carry, _):
                    phys, ws = carry
                    phys, info, ws = self.engine.step_pos_targets(
                        phys, state.link_params, state.friction, targets,
                        patch=patch, f_ws=ws)
                    return (phys, ws), info

                (physics, contact_ws), infos = jax.lax.scan(
                    sim_body, (state.physics, state.contact_ws), None,
                    length=cfg.control.decimation)
                actuator_state = state.actuator_state
            else:
                def sim_body(phys, _):
                    phys, info = self.engine.step_pos_targets(
                        phys, state.link_params, state.friction, targets,
                        patch=patch)
                    return phys, info

                physics, infos = jax.lax.scan(
                    sim_body, state.physics, None,
                    length=cfg.control.decimation)
                actuator_state = state.actuator_state
        elif ctrl == "V":
            # velocity drive (legged_robot.py:385-388): tau =
            # kp*(v_target - qd) - kd*(qd - last_qd)/sim_dt, re-evaluated
            # each sim dt; last_qd is the qd buffer from the END of the
            # previous policy step (refreshed only in post_physics_step,
            # legged_robot.py:133), so it is held over the decimation loop.
            vel_t = a * cfg.control.action_scale
            kp = jnp.asarray(self.p_gains, self.dtype)[:, None]
            kd = jnp.asarray(self.d_gains, self.dtype)[:, None]
            qd_last = state.physics.qd

            def sim_body(carry, _):
                phys, ws = carry
                tau = (kp * (vel_t - phys.qd)
                       - kd * (phys.qd - qd_last) / cfg.sim.dt)
                if self._warm_start:
                    phys, info, ws = self.engine.step_torques(
                        phys, state.link_params, state.friction, tau,
                        patch=patch, f_ws=ws)
                else:
                    phys, info = self.engine.step_torques(
                        phys, state.link_params, state.friction, tau,
                        patch=patch)
                return (phys, ws), info

            (physics, contact_ws), infos = jax.lax.scan(
                sim_body, (state.physics, state.contact_ws), None,
                length=cfg.control.decimation)
            actuator_state = state.actuator_state
        elif ctrl == "T":
            tau = a * cfg.control.action_scale

            def sim_body(carry, _):
                phys, ws = carry
                if self._warm_start:
                    phys, info, ws = self.engine.step_torques(
                        phys, state.link_params, state.friction, tau,
                        patch=patch, f_ws=ws)
                else:
                    phys, info = self.engine.step_torques(
                        phys, state.link_params, state.friction, tau,
                        patch=patch)
                return (phys, ws), info

            (physics, contact_ws), infos = jax.lax.scan(
                sim_body, (state.physics, state.contact_ws), None,
                length=cfg.control.decimation)
            actuator_state = state.actuator_state
        else:
            raise NotImplementedError(f"control_type {ctrl}")

        # sensors from the LAST sim dt (reference refreshes tensors after
        # the loop, legged_robot.py:114-116)
        if infos is None:          # fused chain path computed them already
            contact_f = contact_f_d
            torques = torques_d
        else:
            contact_f = infos.body_forces[-1]
            torques = infos.torques[-1]

        # ---- post-physics bookkeeping ----
        episode_length = state.episode_length + 1
        common_step = state.common_step + 1

        base_lin_vel = physics.base_lin_vel()
        base_ang_vel = physics.base_ang_vel()
        gvec = jnp.asarray([0.0, 0.0, -1.0], self.dtype)[:, None]
        projected_gravity = quat_ops.rotate_inverse(
            physics.quat, jnp.broadcast_to(gvec, (3, n)))

        # command resampling + heading controller (:337-352)
        resample = (episode_length % self.resample_interval) == 0
        commands, vx_unit = self._resample_commands(k_cmd, state.commands,
                                                    resample)
        commands = self._apply_vx_and_deadband(
            commands, vx_unit, state.lin_vel_x_range, resample)
        if cfg.commands.heading_command:
            fwd = quat_ops.rotate(
                physics.quat,
                jnp.broadcast_to(
                    jnp.asarray([1.0, 0.0, 0.0], self.dtype)[:, None],
                    (3, n)))
            heading = jnp.arctan2(fwd[1], fwd[0])
            commands = commands.at[2].set(jnp.clip(
                0.5 * quat_ops.wrap_to_pi(commands[3] - heading),
                -1.0, 1.0))

        # height scan (:818-854)
        if self.measure_heights:
            measured = self._get_heights(physics, patch)   # (P, N)
        else:
            measured = jnp.zeros((1, n), self.dtype)

        # random pushes (:436-441): set world-frame base xy velocity
        if cfg.domain_rand.push_robots:
            do_push = (common_step % self.push_interval) == 0
            push_xy = jax.random.uniform(
                k_push, (2, n), self.dtype,
                -cfg.domain_rand.max_push_vel_xy,
                cfg.domain_rand.max_push_vel_xy)
            lin_w = physics.world_lin_vel()
            lin_w = jnp.where(do_push, push_xy[0], lin_w[0]), \
                jnp.where(do_push, push_xy[1], lin_w[1]), lin_w[2]
            lin_w = jnp.stack(lin_w)
            v_b = quat_ops.rotate_inverse(physics.quat, lin_w)
            physics = dataclasses.replace(
                physics, vel=physics.vel.at[3:6].set(v_b))
            # NOTE: base_lin_vel deliberately NOT refreshed — in the
            # reference the buffer is computed before _push_robots and
            # rewards/obs of this step see the pre-push velocity
            # (legged_robot.py:122-131,436-441); the push only enters the
            # next step's dynamics.

        # ---- termination (:143-148) ----
        if len(self.term_idx):
            tf = contact_f[:, jnp.asarray(self.term_idx)]   # (3, k, N)
            term = jnp.any(
                jnp.linalg.norm(tf, axis=0) > 1.0, axis=0)
        else:
            term = jnp.zeros(n, bool)
        time_out = episode_length > self.max_episode_length
        done = term | time_out

        # ---- rewards (:195-212, 857-966) ----
        feet_air_time = state.feet_air_time
        ctx = dict(
            physics=physics, base_lin_vel=base_lin_vel,
            base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, commands=commands,
            torques=torques, contact_forces=contact_f,
            measured_heights=measured, last_actions=state.last_actions,
            actions=a, last_dof_vel=state.last_dof_vel,
            term=term, time_out=time_out)

        # stateful feet_air_time term computed inline (:941-949)
        if len(self.feet_idx):
            fz = contact_f[2, jnp.asarray(self.feet_idx)]       # (nf, N)
            contact = fz > 1.0
            first_contact = (feet_air_time > 0.0) & contact
            feet_air_time = feet_air_time + self.dt
            rew_air = jnp.sum((feet_air_time - 0.5) * first_contact,
                              axis=0)
            rew_air = rew_air * (
                jnp.linalg.norm(commands[:2], axis=0) > 0.1)
            feet_air_time = feet_air_time * (~contact)
            ctx["feet_air_time_reward"] = rew_air

        reward = jnp.zeros(n, self.dtype)
        episode_sums = dict(state.episode_sums)
        for name in self.reward_names:
            r = self._reward(name, ctx) * self.reward_scales[name]
            reward = reward + r
            episode_sums[name] = episode_sums[name] + r
        if cfg.rewards.only_positive_rewards:
            reward = jnp.maximum(reward, 0.0)
        if "termination" in self.reward_scales:
            r = ((term & ~time_out).astype(self.dtype)
                 * self.reward_scales["termination"])
            reward = reward + r
            episode_sums["termination"] = episode_sums["termination"] + r

        # ---- masked reset (:150-193) ----
        donef = done.astype(self.dtype)

        # terrain curriculum (:443-463)
        terrain_level = state.terrain_level
        env_origin = state.env_origin
        if cfg.terrain.curriculum:
            dist = jnp.linalg.norm(physics.pos[:2] - env_origin[:2],
                                   axis=0)
            move_up = dist > self.terrain.env_length / 2
            move_down = (dist < jnp.linalg.norm(commands[:2], axis=0)
                         * self.max_episode_length_s * 0.5) & ~move_up
            new_lvl = (terrain_level + move_up.astype(jnp.int32)
                       - move_down.astype(jnp.int32))
            rand_lvl = jax.random.randint(k_lvl, (n,), 0,
                                          self.max_terrain_level)
            new_lvl = jnp.where(new_lvl >= self.max_terrain_level,
                                rand_lvl, jnp.maximum(new_lvl, 0))
            terrain_level = jnp.where(done, new_lvl, terrain_level)
            t_origins = jnp.asarray(self.terrain_origins, self.dtype)
            looked_up = t_origins[terrain_level,
                                  jnp.asarray(self.terrain_types)].T
            env_origin = jnp.where(done[None, :], looked_up, env_origin)

        # command curriculum (:465-474): global, every max_episode_length
        # common steps, gated on mean tracking reward of finishing envs
        lin_vel_x_range = state.lin_vel_x_range
        if cfg.commands.curriculum and "tracking_lin_vel" in \
                self.reward_scales:
            count = jnp.sum(donef)
            mean_track = jnp.sum(
                episode_sums["tracking_lin_vel"] * donef) / jnp.maximum(
                    count, 1.0)
            crit = (mean_track / self.max_episode_length
                    > 0.8 * self.reward_scales["tracking_lin_vel"])
            fire = ((common_step % self.max_episode_length) == 0) \
                & (count > 0) & crit
            mc = cfg.commands.max_curriculum
            widened = jnp.stack([
                jnp.clip(lin_vel_x_range[0] - 0.5, -mc, 0.0),
                jnp.clip(lin_vel_x_range[1] + 0.5, 0.0, mc)])
            lin_vel_x_range = jnp.where(fire, widened, lin_vel_x_range)

        # new physics for reset envs
        k_phys, k_rc, k_f, k_m = jax.random.split(k_reset, 4)
        reset_phys = self._draw_reset_physics(k_phys, env_origin)
        physics = jax.tree.map(
            lambda new, old: jnp.where(done[None, :], new, old),
            reset_phys, physics)

        # resample commands of reset envs (:165)
        commands, vx_unit = self._resample_commands(k_rc, commands, done)
        commands = self._apply_vx_and_deadband(commands, vx_unit,
                                               lin_vel_x_range, done)

        # domain-rand redraw on reset (TPU extension; off by default for
        # reference parity — the reference draws once at creation)
        friction, mass_scales, link_params = (state.friction,
                                              state.mass_scales,
                                              state.link_params)
        if cfg.domain_rand.resample_on_reset:
            new_f = self._draw_friction(k_f, n)
            new_m = self._draw_mass_scales(k_m, n)
            friction = jnp.where(done, new_f, friction)
            mass_scales = jnp.where(done[None, :], new_m, mass_scales)
            link_params = self._link_params(mass_scales, n)

        # reset envs: swap in their (possibly new) cell's static window
        if self.grid is not None:
            cells = self._env_cells(terrain_level)
            rp, rpT, rr0, rc0 = self._cell_patch_lookup(cells)
            ph_c = jnp.where(done[:, None, None], rp, ph_c)
            ph_T = jnp.where(done[None, None, :], rpT, ph_T)
            pr0 = jnp.where(done, rr0, pr0)
            pc0 = jnp.where(done, rc0, pc0)
        else:
            ph_c, ph_T = state.patch, state.patch_T
            pr0, pc0 = state.patch_r0, state.patch_c0

        feet_air_time = feet_air_time * (~done)[None, :]
        ep_len_sum = jnp.sum(episode_length * done)
        episode_length = jnp.where(done, 0, episode_length)
        # actuator recurrent state zeroed per reset env (anymal.py:56-60)
        if actuator_state:
            actuator_state = jax.tree.map(
                lambda x: x * (~done).astype(x.dtype), actuator_state)

        # episode logging sums over envs that finished this step
        ep_out = {name: jnp.sum(episode_sums[name] * donef)
                  / self.max_episode_length_s
                  for name in episode_sums}
        episode_sums = {name: s * (1.0 - donef)
                        for name, s in episode_sums.items()}

        # ---- observations (:214-231) ----
        obs, obs_clean = self._compute_obs(
            physics, base_lin_vel, base_ang_vel, projected_gravity,
            commands, a, measured, k_noise)
        clip_o = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_o, clip_o)
        priv_obs = None
        if self.num_privileged_obs is not None:
            # noiseless obs + true ground friction + base-mass scale +
            # feet contact forces (asymmetric-critic inputs the real
            # robot cannot sense)
            feet_f = (contact_f[:, jnp.asarray(self.feet_idx)]
                      .reshape(3 * len(self.feet_idx), n))
            priv_obs = jnp.concatenate([
                jnp.clip(obs_clean, -clip_o, clip_o),
                friction[None, :],
                mass_scales[:1],
                feet_f * 0.01,
            ], axis=0).T                                  # (N, P)

        if self._warm_start:
            # fresh spawns start with no remembered stick anchors: reset
            # to the far sentinel so the stale rule re-snaps on first
            # touch wherever the env origin is (env axis is last in every
            # anchor layout)
            from legged_gym_tpu.physics.contact import ANCHOR_SENTINEL
            contact_ws = jax.tree.map(
                lambda a: jnp.where(done, jnp.asarray(
                    ANCHOR_SENTINEL, a.dtype), a), contact_ws)
        else:
            contact_ws = None
        new_state = EnvState(
            physics=physics, rng=rng, episode_length=episode_length,
            common_step=common_step, commands=commands, actions=a,
            patch=ph_c, patch_T=ph_T, patch_r0=pr0, patch_c0=pc0,
            last_actions=a, last_dof_vel=physics.qd,
            feet_air_time=feet_air_time, terrain_level=terrain_level,
            env_origin=env_origin, friction=friction,
            mass_scales=mass_scales, link_params=link_params,
            lin_vel_x_range=lin_vel_x_range, episode_sums=episode_sums,
            actuator_state=actuator_state, contact_ws=contact_ws)
        # note: last_dof_vel buffer zeroing for reset envs is the
        # reference's dead store (see module docstring) — post-reset qd is
        # zero-mean U(-0.5,0.5)... actually qd is exactly 0 after reset, so
        # storing physics.qd matches both readings.

        tr = Transition(
            obs=obs.T, privileged_obs=priv_obs, reward=reward, done=done,
            time_out=time_out,
            episode_sums=ep_out, episode_count=jnp.sum(donef),
            episode_length_sum=ep_len_sum.astype(self.dtype),
            terrain_level_mean=jnp.mean(terrain_level.astype(self.dtype)),
            max_command_x=lin_vel_x_range[1],
            torques=torques,
            feet_contact_z=(contact_f[2, jnp.asarray(self.feet_idx)]
                            if len(self.feet_idx)
                            else jnp.zeros((0, n), self.dtype)))
        return new_state, tr

    # ------------------------------------------------------------- teleop

    def set_commands(self, state: EnvState, vx, vy, wz):
        """Override every env's velocity command (the reference's teleop
        hook _change_cmds, legged_robot.py:970-975; consumed by
        play_joy.py:119). Pure: returns a new state."""
        c = state.commands
        n = c.shape[-1]
        c = c.at[0].set(jnp.full((n,), vx, self.dtype))
        c = c.at[1].set(jnp.full((n,), vy, self.dtype))
        c = c.at[2].set(jnp.full((n,), wz, self.dtype))
        return dataclasses.replace(state, commands=c)

    # ------------------------------------------------------- observations

    def _get_heights(self, physics, patch=None):
        """Yaw-rotated height scan, min-of-3-cells rule (:818-854)."""
        if self.grid is None:
            return jnp.zeros((self.num_height_points, physics.n),
                             self.dtype)
        pts = jnp.asarray(self.height_points, self.dtype)  # (2, P)
        # rotate each base-frame point by the base yaw, translate by base xy
        p3 = jnp.concatenate(
            [pts, jnp.zeros((1, pts.shape[1]), self.dtype)])  # (3, P)
        # (3, P, N): yaw_rotate handles broadcast over trailing axes
        rot = quat_ops.yaw_rotate(physics.quat[:, None, :],
                                  p3[:, :, None])
        x = rot[0] + physics.pos[0][None, :]
        y = rot[1] + physics.pos[1][None, :]
        if patch is not None:
            return patch_sample_min3(self.grid, patch, x, y)
        return sample_min3(self.grid, x, y)

    def _compute_obs(self, physics, base_lin_vel, base_ang_vel,
                     projected_gravity, commands, actions, measured, key):
        s = self.obs_scales
        parts = [
            base_lin_vel * s["lin_vel"],
            base_ang_vel * s["ang_vel"],
            projected_gravity,
            commands[:3] * jnp.asarray(self.commands_scale,
                                       self.dtype)[:, None],
            (physics.q - jnp.asarray(self.default_dof_pos,
                                     self.dtype)[:, None]) * s["dof_pos"],
            physics.qd * s["dof_vel"],
            actions,
        ]
        if self.measure_heights:
            h = jnp.clip(physics.pos[2][None, :] - 0.5 - measured,
                         -1.0, 1.0) * s["height_measurements"]
            parts.append(h)
        clean = jnp.concatenate(parts, axis=0)           # (obs_dim, N)
        obs = clean
        if self.cfg.noise.add_noise:
            noise = (2.0 * jax.random.uniform(key, obs.shape, self.dtype)
                     - 1.0) * jnp.asarray(self.noise_vec,
                                          self.dtype)[:, None]
            obs = clean + noise
        return obs, clean

    # ------------------------------------------------------- reward terms
    # formulas: legged_robot.py:857-966 (fork variant incl. energy,
    # hip_motion), cassie.py:43-46 (no_fly)

    def _reward(self, name, ctx):
        return getattr(self, "_reward_" + name)(ctx)

    def _reward_lin_vel_z(self, c):
        return jnp.square(c["base_lin_vel"][2])

    def _reward_ang_vel_xy(self, c):
        return jnp.sum(jnp.square(c["base_ang_vel"][:2]), axis=0)

    def _reward_orientation(self, c):
        return jnp.sum(jnp.square(c["projected_gravity"][:2]), axis=0)

    def _reward_base_height(self, c):
        h = jnp.mean(c["physics"].pos[2][None, :] - c["measured_heights"],
                     axis=0)
        return jnp.square(h - self.cfg.rewards.base_height_target)

    def _reward_torques(self, c):
        return jnp.sum(jnp.square(c["torques"]), axis=0)

    def _reward_energy(self, c):
        return jnp.sum(jnp.square(c["torques"] * c["physics"].qd), axis=0)

    def _reward_dof_vel(self, c):
        return jnp.sum(jnp.square(c["physics"].qd), axis=0)

    def _reward_dof_acc(self, c):
        return jnp.sum(
            jnp.square((c["last_dof_vel"] - c["physics"].qd) / self.dt),
            axis=0)

    def _reward_action_rate(self, c):
        return jnp.sum(jnp.square(c["last_actions"] - c["actions"]),
                       axis=0)

    def _reward_collision(self, c):
        if not len(self.penal_idx):
            return jnp.zeros(c["physics"].n, self.dtype)
        f = c["contact_forces"][:, jnp.asarray(self.penal_idx)]
        return jnp.sum(
            (jnp.linalg.norm(f, axis=0) > 0.1).astype(self.dtype), axis=0)

    def _reward_dof_pos_limits(self, c):
        q = c["physics"].q
        lo = jnp.asarray(self.soft_dof_lower, self.dtype)[:, None]
        hi = jnp.asarray(self.soft_dof_upper, self.dtype)[:, None]
        out = jnp.minimum(q - lo, 0.0) * -1.0 + jnp.maximum(q - hi, 0.0)
        return jnp.sum(out, axis=0)

    def _reward_dof_vel_limits(self, c):
        lim = (jnp.asarray(self.dof_vel_limit, self.dtype)[:, None]
               * self.cfg.rewards.soft_dof_vel_limit)
        return jnp.sum(
            jnp.clip(jnp.abs(c["physics"].qd) - lim, 0.0, 1.0), axis=0)

    def _reward_torque_limits(self, c):
        lim = (jnp.asarray(self.torque_limit, self.dtype)[:, None]
               * self.cfg.rewards.soft_torque_limit)
        return jnp.sum(jnp.maximum(jnp.abs(c["torques"]) - lim, 0.0),
                       axis=0)

    def _reward_tracking_lin_vel(self, c):
        err = jnp.sum(
            jnp.square(c["commands"][:2] - c["base_lin_vel"][:2]), axis=0)
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    def _reward_tracking_ang_vel(self, c):
        err = jnp.square(c["commands"][2] - c["base_ang_vel"][2])
        return jnp.exp(-err / self.cfg.rewards.tracking_sigma)

    def _reward_feet_air_time(self, c):
        return c["feet_air_time_reward"]

    def _reward_stumble(self, c):
        f = c["contact_forces"][:, jnp.asarray(self.feet_idx)]  # (3, nf, N)
        lateral = jnp.linalg.norm(f[:2], axis=0)
        return jnp.any(lateral > 5.0 * jnp.abs(f[2]),
                       axis=0).astype(self.dtype)

    _reward_feet_stumble = _reward_stumble

    def _reward_stand_still(self, c):
        dq = jnp.sum(jnp.abs(
            c["physics"].q - jnp.asarray(self.default_dof_pos,
                                         self.dtype)[:, None]), axis=0)
        return dq * (jnp.linalg.norm(c["commands"][:2], axis=0) < 0.1)

    def _reward_feet_contact_forces(self, c):
        f = c["contact_forces"][:, jnp.asarray(self.feet_idx)]
        return jnp.sum(jnp.maximum(
            jnp.linalg.norm(f, axis=0)
            - self.cfg.rewards.max_contact_force, 0.0), axis=0)

    def _reward_hip_motion(self, c):
        q = c["physics"].q[jnp.asarray(self.hip_idx)]
        dflt = jnp.asarray(self.default_dof_pos,
                           self.dtype)[jnp.asarray(self.hip_idx), None]
        return jnp.sum(jnp.abs(q - dflt), axis=0)

    def _reward_no_fly(self, c):
        """Cassie: exactly one foot in contact (cassie.py:43-46)."""
        f = c["contact_forces"][2, jnp.asarray(self.feet_idx)]
        single = jnp.sum((f > 0.1).astype(self.dtype), axis=0) == 1
        return single.astype(self.dtype)
