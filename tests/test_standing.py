"""Standing-quality regression across robot families.

Guards the round-1/round-2 failure class where a physics artifact
(soft contact mass, capped static support force, spawn penetration)
makes a robot sag/sink until penalized collision bodies touch the
ground, which zeroes the whole reward under only_positive_rewards and
silently flatlines training. Asserts, per robot: settles standing, no
terminations in the settled window, bounded jitter.

Per-robot notes:
- anymal_c_flat drives through the SEA net only (no PD): with the
  drive-matched contact-mass calibration + anchored static friction
  (r4) it settles standing at z~0.50 (the reference target height)
  with positive standing reward — the r3 "truthful crouch" to z=0.31
  was the anchor-ratchet artifact (contact.py anchored_tangential),
  not a torque limit.
- aliengo: random-scaled spawns (q = default * U(0.5, 1.5), reference
  _reset_dofs semantics) near the calf hard stop (default 0.054 rad
  away) are sometimes passively unrecoverable — those envs fall,
  terminate and re-roll, so zero-termination over a long window is not
  a property of this robot (training recovers such spawns with
  actions; zero-action PD cannot). The aliengo test instead asserts a
  settled MAJORITY standing quietly — the tripwire for the old
  splay-collapse cycle where NO env ever stood.
- cassie (biped) falls under zero action, as in the reference
  (cassie.py never claims passive stability); covered by
  test_cassie_falls_cleanly instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_tpu import registry

#          task        settle steps, require positive reward, qd bound
ROBOTS = [("go1", 60, True, 0.35),
          ("a1", 60, True, 0.35),
          ("a1_src", 60, True, 0.35),
          ("anymal_c_flat", 100, True, 0.35)]


def _build(task):
    cfg, _ = registry.get_cfgs(task)
    cfg.env.num_envs = 8
    cfg.terrain.mesh_type = "plane"
    cfg.terrain.measure_heights = False
    cfg.env.num_observations = 48
    for f in ("randomize_friction", "randomize_base_mass",
              "randomize_limb_mass", "push_robots"):
        setattr(cfg.domain_rand, f, False)
    cfg.noise.add_noise = False
    env, cfg = registry.make_env(cfg=cfg)
    return env


def _roll(env, steps):
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = env.set_commands(state, 0.0, 0.0, 0.0)
    za = jnp.zeros((env.num_envs, env.num_actions))

    @jax.jit
    def roll(s):
        def body(c, _):
            c, tr = env.step(c, za)
            return c, (tr.reward, tr.done, c.physics.qd)
        return jax.lax.scan(body, s, None, length=steps)

    return roll(state)


@pytest.mark.parametrize("task,steps,want_reward,qd_max", ROBOTS)
def test_stands_clean(task, steps, want_reward, qd_max):
    env = _build(task)
    state, (rew, done, qd) = _roll(env, steps)

    # settled window = last 20 steps
    qd_tail = np.abs(np.asarray(qd[-20:]))
    assert qd_tail.mean() < qd_max, f"{task}: standing jitter {qd_tail.mean()}"
    assert not np.asarray(done[-20:]).any(), f"{task}: terminations at stand"
    if want_reward:
        assert np.asarray(rew[-20:]).mean() > 1e-4, (
            f"{task}: no positive standing reward "
            f"({np.asarray(rew[-20:]).mean():.2e}) — collision penalty or "
            f"zero-clip regression")
    z = np.asarray(state.physics.pos[2])
    assert np.isfinite(z).all() and (z > 0.15).all(), f"{task}: fell (z={z})"


def test_aliengo_majority_stands():
    """Aliengo: a settled majority must be standing quietly at the end
    of a 300-step zero-action window (see module docstring: individual
    envs with near-hard-stop spawns legitimately fall and re-roll, so
    zero-termination is not asserted). Regression tripwire for the
    splay-collapse cycle where NO env ever reached a stable stance."""
    env = _build("aliengo")
    state, (rew, done, qd) = _roll(env, 300)
    z = np.asarray(state.physics.pos[2])
    qd_end = np.abs(np.asarray(qd[-10:])).mean(axis=(0, 1))
    standing = (z > 0.3) & (qd_end < 1.0)
    assert np.isfinite(np.asarray(state.physics.pos)).all()
    assert standing.sum() >= 5, (
        f"only {standing.sum()}/8 aliengo envs settled standing "
        f"(z={np.round(z, 2)}, |qd|={np.round(qd_end, 2)})")
    # the settled envs must be earning positive standing reward
    assert np.asarray(rew[-20:]).mean() > 1e-4


def test_cassie_falls_cleanly():
    """Biped under zero action: falls (as in the reference — no passive
    stability), terminates via pelvis contact, resets keep state finite.
    This is the documented cassie-specific behavior (VERDICT r2 #6)."""
    env = _build("cassie")
    state, (rew, done, qd) = _roll(env, 100)
    assert np.asarray(done).sum() > 0, "cassie should fall under zero action"
    assert np.isfinite(np.asarray(state.physics.pos)).all()
    assert np.isfinite(np.asarray(rew)).all()
    # resets respawn it upright (never stuck underground / NaN)
    z = np.asarray(state.physics.pos[2])
    assert (z > 0.0).all() and (z < 2.0).all(), z
