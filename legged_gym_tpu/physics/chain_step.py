"""Chain-structured physics substep — the shared body of the fast path.

Everything here is pure ``jnp`` on arrays whose LAST axis is the env
batch and whose second-to-last axis is the CHAIN (leg) axis, so the same
functions run (a) under plain ``jax.jit`` (CPU tests, differentiable
path) and (b) verbatim inside a Pallas TPU kernel (pallas_step.py),
where the chain axis lands in sublanes and the env axis in lanes. There
are NO gathers, scatters, ``.at[]`` ops, or dynamic indexing anywhere:
the serial-chain decomposition (chains.py) makes every parent lookup a
previous-level array and every reduction an explicit sum.

All array-valued constants (joint frames, gains, point offsets) travel
in a dict ``cv`` built once by :func:`const_values` — Pallas kernels
cannot capture array constants, so the kernel passes them as inputs and
the plain path passes them as arrays; the math below is agnostic.

Physics semantics are identical to engine.py's general stacked path
(PD position drive with implicit damping, joint-limit springs, velocity
caps, implicit impulse contact vs heightfield patches with a contact
plane cached per sim dt — the PhysX-persistent-manifold analog;
reference behavior at legged_robot.py:89-99, 394-397, 436-441).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.ops import lin
from legged_gym_tpu.ops import quat as quat_ops
from legged_gym_tpu.ops.quat import cross


@dataclasses.dataclass(frozen=True)
class ChainConsts:
    """Host-side constant bundle. Scalars/structure only are read at
    trace time; array values go through const_values()."""
    cm: object                 # ChainModel
    dt_inner: float
    substeps: int
    decimation: int
    gravity: tuple
    kp: np.ndarray             # (L, K)
    kd_eff: np.ndarray
    effort: np.ndarray
    implicit_d: np.ndarray
    limit_stiffness: float
    limit_damping: float
    lower: np.ndarray
    upper: np.ndarray
    qd_cap: np.ndarray
    base_ang_cap: float
    base_lin_cap: float
    mu_terrain: float
    slip_velocity: float
    baumgarte: float
    max_pushout_vel: float
    border_size: float
    horizontal_scale: float
    # trimesh vertical-face rule (TerrainGrid.wall_thresh): >0 enables
    # the per-cell wall collapse in sample_patch_plane
    wall_thresh: float
    patch_S: int
    # sample the contact plane once per POLICY step (True, default) or
    # once per sim dt (False). Per-policy-step matches PhysX's broadphase
    # cadence loosely (points drift <~2 cm in 20 ms) and cuts the
    # sampling instruction count 4x — the sampler is the single biggest
    # instruction block in the fused kernel.
    plane_per_step: bool = True
    # anchored static friction (contact.ContactConfig.warm_start): when
    # on, per-point tangential anchors ride the decimation carry and the
    # tangential force is the implicit anchor law
    # (contact.anchored_tangential). Field names match ContactConfig so
    # the shared law can read either config object.
    warm_start: bool = False
    anchor_beta: float = 0.5
    anchor_vmax: float = 1.0
    anchor_stale2: float = 0.01
    anchor_release_depth: float = 0.005
    # torque drive (Engine.step_torques semantics): `targets` is a held
    # torque (L, K, N) clipped to the effort limits instead of PD
    # position targets. Used by the fused SEA path (ChainEngine builds a
    # decimation=1 torque-mode ChainConsts whose implicit_d is the
    # PASSIVE impedance) — the actuator net re-evaluates between sim-dt
    # segments.
    torque_mode: bool = False


def const_values(cc: ChainConsts, dtype=np.float32, env_nd=1) -> dict:
    """All array constants the substep body needs, as numpy arrays with
    ``env_nd`` trailing broadcast axes (the env batch may be 1-D in the
    plain path or 2-D — (groups-of-8, 128) — inside the Pallas kernel,
    where splitting the batch over sublanes AND lanes makes every
    elementwise op a full (8, 128) vreg instead of a (K, 128) one).
    Passed to the kernel as inputs (Pallas can't capture array consts)."""
    cm = cc.cm
    e = (1,) * env_nd

    def t(a):
        return np.asarray(a).reshape(np.shape(a) + e)

    # closed-form joint rotation: R(q) = Rj @ Rot(axis, q)
    #                                   = RjA cos q + RjB sin q + RjC
    # with constant RjA = Rj - Rj a a^T, RjB = Rj [a]x, RjC = Rj a a^T —
    # 36 jnp calls per level instead of Rodrigues + a matmul (~75)
    a_ = cm.axis                                        # (L,K,3)
    aaT = np.einsum("lki,lkj->lkij", a_, a_)
    RjaaT = np.einsum("lkim,lkmj->lkij", cm.Rj, aaT)
    ske = np.zeros((cm.L, cm.K, 3, 3))
    ske[..., 0, 1] = -a_[..., 2]
    ske[..., 0, 2] = a_[..., 1]
    ske[..., 1, 0] = a_[..., 2]
    ske[..., 1, 2] = -a_[..., 0]
    ske[..., 2, 0] = -a_[..., 1]
    ske[..., 2, 1] = a_[..., 0]
    Rjsk = np.einsum("lkim,lkmj->lkij", cm.Rj, ske)

    def rot4(a):
        return t(np.transpose(a, (0, 2, 3, 1)))         # (L,3,3,K,1*)

    cv = {
        "ax": t(np.moveaxis(cm.axis, -1, 1)),           # (L,3,K,1*)
        "Rj": t(np.transpose(cm.Rj, (0, 2, 3, 1))),     # (L,3,3,K,1*)
        "RjA": rot4(cm.Rj - RjaaT),
        "RjB": rot4(Rjsk),
        "RjC": rot4(RjaaT),
        "pj": t(np.moveaxis(cm.pj, -1, 1)),             # (L,3,K,1*)
        "kp": t(cc.kp),                                 # (L,K,1*)
        "kd_eff": t(cc.kd_eff),
        "effort": t(cc.effort),
        "implicit_d": t(cc.implicit_d),
        "lower": t(cc.lower),
        "upper": t(cc.upper),
        "qd_cap": t(cc.qd_cap),
        "damping": t(cm.damping),
        "armature": t(cm.armature),
        "grav": t(np.asarray(cc.gravity)),              # (3,1*)
        # pre-tiled over chains: Mosaic can't broadcast a (1,1) tile into
        # both sublanes and lanes in one op
        "gravK": t(np.tile(np.asarray(cc.gravity)[:, None], (1, cm.K))),
        "iota": np.arange(cc.patch_S, dtype=np.float64)[:, None],  # (S,1)
    }
    for gi, g in enumerate(cm.groups):
        cv[f"goff{gi}"] = t(np.moveaxis(g.offs, -1, 0))  # (3,S,K,1*)
        cv[f"grad{gi}"] = t(g.radius)                    # (S,K,1*)
        cv[f"gme{gi}"] = t(g.m_eff)
        cv[f"gmet{gi}"] = t(g.m_eff_t)
        # reciprocals precomputed for the direction-aware apparent mass
        # (one in-kernel reciprocal instead of three divides per point)
        cv[f"gimn{gi}"] = t(1.0 / np.maximum(g.m_eff, 1e-9))
        cv[f"gimt{gi}"] = t(1.0 / np.maximum(g.m_eff_t, 1e-9))
        cv[f"gvp{gi}"] = t(g.vmax)
        cv[f"gks{gi}"] = t(g.k_static)
        cv[f"gact{gi}"] = t(g.active.astype(np.float64))
    return {k: np.asarray(v, dtype) for k, v in cv.items()}


# --------------------------------------------------------------- FK sweep

def fk_chain(cc: ChainConsts, cv, pos, quat, vel, q, qd):
    """Level-parallel FK. pos (3,N), quat (4,N), vel (6,N), q/qd (L,K,N).

    Returns dict with base pose and per-level lists (index l):
      R_w[l] (3,3,K,N), p_w[l] (3,K,N), w[l]/v[l] (3,K,N) link frame,
      R_loc[l] (3,3,K,N).
    Mirrors kinematics.forward_kinematics (same math, chain layout).
    """
    cm = cc.cm
    R0 = quat_ops.to_matrix(quat)                     # (3,3,N)
    w0 = vel[0:3]
    v0 = vel[3:6]
    env = pos.shape[1:]                # env batch may be 1-D or 2-D

    R_w, p_w, w_l, v_l, R_loc = [], [], [], [], []
    for l in range(cm.L):
        ax = cv["ax"][l]                              # (3,K,1)
        pj = cv["pj"][l]                              # (3,K,1)
        q_l, qd_l = q[l], qd[l]                       # (K,N)

        # closed-form R = RjA cos q + RjB sin q + RjC (see const_values)
        ccos = jnp.cos(q_l)
        s = jnp.sin(q_l)
        A_, B_, C_ = cv["RjA"][l], cv["RjB"][l], cv["RjC"][l]
        R = jnp.stack([
            jnp.stack([A_[i, j] * ccos + B_[i, j] * s + C_[i, j]
                       for j in range(3)])
            for i in range(3)])                       # (3,3,K,N)
        if l == 0:
            Rp = R0[:, :, None]                       # (3,3,1,N)
            pp = pos[:, None]
            wp = w0[:, None]
            vp = v0[:, None]
        else:
            Rp, pp, wp, vp = R_w[l - 1], p_w[l - 1], w_l[l - 1], v_l[l - 1]
        pjb = jnp.broadcast_to(pj, (3, cm.K) + env)
        R_w.append(lin.mm(Rp, R))
        p_w.append(pp + lin.mv(Rp, pjb))
        w_l.append(lin.mtv(R, wp) + ax * qd_l[None])
        v_l.append(lin.mtv(R, vp + cross(wp, pjb)))
        R_loc.append(R)
    return dict(R0=R0, p0=pos, w0=w0, v0=v0,
                R_w=R_w, p_w=p_w, w=w_l, v=v_l, R_loc=R_loc)


# ---------------------------------------------------- contact point state

def contact_points_group(cc: ChainConsts, cv, fk, gi):
    """World position / velocity of point group gi: (pos, vel) each
    (3,S,K,N) — base group has K == 1."""
    cm = cc.cm
    g = cm.groups[gi]
    offs = cv[f"goff{gi}"]                          # (3,S,K,1)
    if g.level < 0:
        R = fk["R0"][:, :, None, None]              # (3,3,1,1,N)
        p = fk["p0"][:, None, None]                 # (3,1,1,N)
        w = fk["w0"][:, None, None]
        v = fk["v0"][:, None, None]
    else:
        l = g.level
        R = fk["R_w"][l][:, :, None]                # (3,3,1,K,N)
        p = fk["p_w"][l][:, None]                   # (3,1,K,N)
        w = fk["w"][l][:, None]
        v = fk["v"][l][:, None]
    pos = p + lin.mv(R, offs)                       # (3,S,K,N)
    vel = lin.mv(R, v + cross(w, jnp.broadcast_to(offs, pos.shape)))
    return pos, vel


def contact_points_chain(cc: ChainConsts, cv, fk):
    """World position / velocity per point group (all groups)."""
    return [contact_points_group(cc, cv, fk, gi)
            for gi in range(len(cc.cm.groups))]


# --------------------------------------------------------- patch sampling

def sample_patch_plane(cc: ChainConsts, cv, ph, pr0, pc0, x, y):
    """Bilinear height + gradient at world (x, y) against the per-env
    patch ``ph`` (S, S, N) with window origin (pr0, pc0) (broadcastable
    to (N,)) in grid cells. x, y: (..., N).

    One-hot row/col contractions, unrolled over the S patch rows so the
    largest temp is (..., S, N) — Mosaic-safe, no gathers.
    Mirrors terrain/heightfield.patch_sample_bilinear.
    """
    env_nd = ph.ndim - 2            # ph is (S, S) + env
    lead = x.shape[:x.ndim - env_nd]
    if len(lead) >= 2:
        # loop point slots so the largest temp stays (K, S) + env — VMEM
        # budget inside the kernel
        hs_, dxs_, dys_ = [], [], []
        for s in range(lead[0]):
            h_, dx_, dy_ = sample_patch_plane(cc, cv, ph, pr0, pc0,
                                              x[s], y[s])
            hs_.append(h_)
            dxs_.append(dx_)
            dys_.append(dy_)
        return (jnp.stack(hs_), jnp.stack(dxs_), jnp.stack(dys_))

    dt = ph.dtype
    S = cc.patch_S
    hs = cc.horizontal_scale
    fx = (x + cc.border_size) / hs - pr0.astype(dt)
    fy = (y + cc.border_size) / hs - pc0.astype(dt)
    fx = jnp.clip(fx, 0.0, S - 1.001)
    fy = jnp.clip(fy, 0.0, S - 1.001)
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    tx = fx - ix
    ty = fy - iy

    # insert the S axis just before the env axes
    s_axis = x.ndim - env_nd

    def ins(a):
        return jnp.expand_dims(a, s_axis)

    iota = cv["iota"].astype(dt).reshape(
        (1,) * len(lead) + (S,) + (1,) * env_nd)
    ex = (iota == ins(ix)).astype(dt)                   # (lead,S,env)
    ex1 = (iota == ins(ix + 1.0)).astype(dt)
    ey = (iota == ins(iy)).astype(dt)
    ey1 = (iota == ins(iy + 1.0)).astype(dt)
    wx = ex * ins(1.0 - tx) + ex1 * ins(tx)
    wy = ey * ins(1.0 - ty) + ey1 * ins(ty)
    inv_hs = 1.0 / hs
    dwx = (ex1 - ex) * inv_hs
    dwy = (ey1 - ey) * inv_hs

    # middle-axis int indexing emits a gather (unsupported in Mosaic);
    # slice_in_dim keeps it a slice. Unrolled over patch rows.
    row = lambda a, r: jax.lax.slice_in_dim(a, r, r + 1, axis=s_axis)
    txp = row(wx, 0) * ph[0]
    gxp = row(dwx, 0) * ph[0]
    for r in range(1, S):
        txp = txp + row(wx, r) * ph[r]
        gxp = gxp + row(dwx, r) * ph[r]
    h = jnp.sum(txp * wy, axis=s_axis)
    dhdy = jnp.sum(txp * dwy, axis=s_axis)
    dhdx = jnp.sum(gxp * wy, axis=s_axis)
    if cc.wall_thresh > 0.0:
        # trimesh vertical-face rule (TerrainGrid.wall_thresh): steep
        # cells collide as a flat floor at the min corner. mw: per-cell
        # min where the corner spread exceeds the threshold, +BIG
        # elsewhere (elementwise shifts; Mosaic-safe — no gathers).
        ph_r = jnp.concatenate([ph[1:], ph[-1:]], axis=0)
        ph_c = jnp.concatenate([ph[:, 1:], ph[:, -1:]], axis=1)
        ph_rc = jnp.concatenate([ph_c[1:], ph_c[-1:]], axis=0)
        m4 = jnp.minimum(jnp.minimum(ph, ph_r), jnp.minimum(ph_c, ph_rc))
        big4 = jnp.maximum(jnp.maximum(ph, ph_r),
                           jnp.maximum(ph_c, ph_rc))
        mw = jnp.where(big4 - m4 > cc.wall_thresh, m4, 1e9)
        mp = row(ex, 0) * mw[0]
        for r in range(1, S):
            mp = mp + row(ex, r) * mw[r]
        mq = jnp.sum(mp * ey, axis=s_axis)
        steep = mq < h
        h = jnp.where(steep, mq, h)
        dhdx = jnp.where(steep, 0.0, dhdx)
        dhdy = jnp.where(steep, 0.0, dhdy)
    return h, dhdx, dhdy


def plane_consts(cc: ChainConsts, cv, gi, h, dhdx, dhdy, x, y):
    """Per-policy-step plane constants for one point group: offset form
    c0 + normal + DIRECTION-AWARE apparent mass.

    The apparent masses me/met are calibrated along world z / horizontal
    at the default pose (engine.calibrate_contact_mass); on a tilted
    terrain normal the true apparent mass interpolates toward the (much
    smaller) tangential one, and using the vertical mass there
    over-corrects the stopping impulse — restitution > 0 on every slope
    landing (measured: rough-terrain training swamped by a -21/s
    lin_vel_z bounce penalty). Harmonic combination by direction cosines
    = exact for an anisotropic point mass; nz=1 (flat) reduces to the
    calibrated vertical mass (to rounding). Computed ONCE per plane
    refresh — all of this is constant over the substeps that share the
    plane."""
    inv_norm = 1.0 / jnp.sqrt(1.0 + dhdx * dhdx + dhdy * dhdy)
    nx, ny, nz = -dhdx * inv_norm, -dhdy * inv_norm, inv_norm
    nz2 = nz * nz
    gain = (1.0 / (nz2 * cv[f"gimn{gi}"] + (1.0 - nz2) * cv[f"gimt{gi}"])
            / cc.dt_inner) * cv[f"gact{gi}"]      # masked impulse gain
    return (h - dhdx * x - dhdy * y, dhdx, dhdy, nx, ny, nz, gain)


def contact_force_from_plane(cc: ChainConsts, cv, gi, plane, pos, vel,
                             mu_env, anchor=None):
    """Implicit impulse contact force against a cached local plane.

    plane: plane_consts() tuple, each (S,K,N) — sampled once per sim dt
    or per policy step (the PhysX persistent-manifold analog);
    pos/vel: (3,S,K,N). Matches contact.contact_forces (implicit
    branch). With ``cc.warm_start`` and an anchor array (3,S,K,N), the
    tangential term is the implicit anchored-static-friction law and the
    return is (f (3,S,K,N), new_anchor).
    """
    dt_in = cc.dt_inner
    c0, dhdx, dhdy, nx, ny, nz, gain = plane
    x, y, z = pos[0], pos[1], pos[2]
    h = c0 + dhdx * x + dhdy * y

    r = cv[f"grad{gi}"]
    met = cv[f"gmet{gi}"]
    depth = r + (h - z) * nz
    vx, vy, vz = vel[0], vel[1], vel[2]
    v_n = vx * nx + vy * ny + vz * nz
    v_push = jnp.minimum(cc.baumgarte * depth / dt_in, cv[f"gvp{gi}"])
    # one-way static-support spring (see contact.contact_forces /
    # engine.calibrate_contact_mass): no force while separating > 5 cm/s
    # -> plastic landings; carries the standing load at mm depths; depth
    # saturates at 15 mm so deep penetrations resolve via the capped
    # impulse term instead of a spring kick
    fn_raw = (gain * jnp.maximum(v_push - v_n, 0.0)
              + cv[f"gks{gi}"] * cv[f"gact{gi}"]
              * jnp.minimum(depth, 0.015) * (v_n < 0.05))
    fn_mag = jnp.where(depth > 0.0, fn_raw, 0.0)

    vtx = vx - v_n * nx
    vty = vy - v_n * ny
    vtz = vz - v_n * nz
    mu = 0.5 * (mu_env + cc.mu_terrain)

    if cc.warm_start and anchor is not None:
        from legged_gym_tpu.physics.contact import anchored_tangential
        f_t, new_anchor = anchored_tangential(
            cc, pos, fn_mag, mu, jnp.stack([vtx, vty, vtz]),
            jnp.stack([nx, ny, nz]), met, dt_in, anchor,
            depth=depth - (1.0 - cv[f"gact{gi}"]) * 1e9)
        f = jnp.stack([fn_mag * nx + f_t[0],
                       fn_mag * ny + f_t[1],
                       fn_mag * nz + f_t[2]])
        return f, new_anchor

    vt = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
    ft_over_vt = jnp.minimum(mu * fn_mag / (vt + cc.slip_velocity),
                             met / dt_in)
    return jnp.stack([fn_mag * nx - ft_over_vt * vtx,
                      fn_mag * ny - ft_over_vt * vty,
                      fn_mag * nz - ft_over_vt * vtz])


# ----------------------------------------------------------------- ABA

def aba_chain(cc: ChainConsts, cv, lp_base, lp_lvl, fk, qd, tau,
              f_base, n_base, f_lvl, n_lvl, implicit_extra):
    """Chain-layout Featherstone ABA (mirrors physics/aba.py, serial-chain
    specialization: parent of level l is level l-1 same sublane; the
    level-0 links reduce into the base with one sum over K).

    lp_base (10,N); lp_lvl (L,10,K,N); qd/tau (L,K,N);
    f_base/n_base (3,N) world external wrench on the base;
    f_lvl/n_lvl: per-level lists of (3,K,N) world wrenches;
    implicit_extra (L,K,N). Returns a0 (6,N), qdd (L,K,N).
    """
    cm = cc.cm
    dtype = qd.dtype
    L = cm.L
    env = qd.shape[2:]
    def pass1(par, R_w, w, v, f_ext, n_ext, g_const, g_shape):
        m = par[0]
        h = par[1:4]
        A = jnp.stack([
            jnp.stack([par[4], par[5], par[6]]),
            jnp.stack([par[5], par[7], par[8]]),
            jnp.stack([par[6], par[8], par[9]]),
        ])
        IA_B = lin.skew(h)
        IA_C = m[None, None] * lin.eye(m.shape, dtype)
        n_m = lin.mv(A, w) + cross(h, v)
        f_m = m[None] * v - cross(h, w)
        pA_n = cross(w, n_m) + cross(v, f_m)
        pA_f = cross(w, f_m)
        gl = lin.mtv(R_w, jnp.broadcast_to(g_const, g_shape))
        f_tot = m[None] * gl
        n_tot = cross(h, gl)
        if f_ext is not None:
            f_tot = f_tot + lin.mtv(R_w, f_ext)
            n_tot = n_tot + lin.mtv(R_w, n_ext)
        return [A, IA_B, IA_C], [pA_n - n_tot, pA_f - f_tot]

    bIA, bpA = pass1(lp_base, fk["R0"], fk["w0"], fk["v0"],
                     f_base, n_base, cv["grav"], (3,) + env)
    IA, pA = [], []
    for l in range(L):
        A_, p_ = pass1(lp_lvl[l], fk["R_w"][l], fk["w"][l], fk["v"][l],
                       f_lvl[l], n_lvl[l], cv["gravK"], (3, cm.K) + env)
        IA.append(A_)
        pA.append(p_)

    c_ang, c_lin = [], []
    for l in range(L):
        Sqd = cv["ax"][l] * qd[l][None]
        c_ang.append(cross(fk["w"][l], Sqd))
        c_lin.append(cross(fk["v"][l], Sqd))

    # ---- pass 2: tips -> base ----
    per_level = [None] * L
    for l in range(L - 1, -1, -1):
        A_l, B_l, C_l = IA[l]
        pn_l, pf_l = pA[l]
        ax = cv["ax"][l]
        Ua = lin.mv(A_l, ax)
        Ul = lin.mtv(B_l, ax)
        D = (jnp.sum(ax * Ua, axis=0) + cv["armature"][l]
             + implicit_extra[l])
        u = tau[l] - jnp.sum(ax * pn_l, axis=0)
        di = 1.0 / D
        per_level[l] = (Ua, Ul, di, u)

        # symmetric/sparse-aware forms (A, C and the congruences are
        # symmetric; the shift matrix is a skew of the CONSTANT joint
        # offset) — ~30% fewer jnp calls in the hottest ABA block
        Ia_A = A_l - lin.outer_sym(Ua, di)
        Ia_B = B_l - di[None, None] * lin.outer(Ua, Ul)
        Ia_C = C_l - lin.outer_sym(Ul, di)
        ca, cl = c_ang[l], c_lin[l]
        pa_n = pn_l + lin.mv(Ia_A, ca) + lin.mv(Ia_B, cl) \
            + Ua * (di * u)[None]
        pa_f = pf_l + lin.mtv(Ia_B, ca) + lin.mv(Ia_C, cl) \
            + Ul * (di * u)[None]

        R = fk["R_loc"][l]
        pj = cv["pj"][l]
        pjb = jnp.broadcast_to(pj, (3, cm.K) + env)
        RA = lin.congruence_sym(R, Ia_A)
        RB = lin.mm(R, lin.mmt(Ia_B, R))
        RC = lin.congruence_sym(R, Ia_C)
        RBp = lin.mm_skew(RB, pj)              # RB @ p~
        pRC = lin.skew_mm(pj, RC)              # p~ @ RC
        # p~ @ RB^T = -(RB @ p~)^T (skew antisymmetry)
        A_p = (RA - RBp - lin.transpose(RBp)
               - lin.skew_mm(pj, lin.mm_skew(RC, pj)))
        B_p = RB + pRC
        Rf = lin.mv(R, pa_f)
        n_p = lin.mv(R, pa_n) + cross(pjb, Rf)

        if l > 0:
            IA[l - 1][0] = IA[l - 1][0] + A_p
            IA[l - 1][1] = IA[l - 1][1] + B_p
            IA[l - 1][2] = IA[l - 1][2] + RC
            pA[l - 1][0] = pA[l - 1][0] + n_p
            pA[l - 1][1] = pA[l - 1][1] + Rf
        else:
            bIA[0] = bIA[0] + jnp.sum(A_p, axis=2)
            bIA[1] = bIA[1] + jnp.sum(B_p, axis=2)
            bIA[2] = bIA[2] + jnp.sum(RC, axis=2)
            bpA[0] = bpA[0] + jnp.sum(n_p, axis=1)
            bpA[1] = bpA[1] + jnp.sum(Rf, axis=1)

    # ---- base solve ----
    a0_ang, a0_lin = lin.solve66_sym(bIA[0], bIA[1], bIA[2],
                                     -bpA[0], -bpA[1])

    # ---- pass 3: base -> tips ----
    qdd = []
    a_ang_p, a_lin_p = a0_ang[:, None], a0_lin[:, None]
    for l in range(L):
        R = fk["R_loc"][l]
        pjb = jnp.broadcast_to(cv["pj"][l], (3, cm.K) + env)
        aab = jnp.broadcast_to(a_ang_p, (3, cm.K) + env)
        alb = jnp.broadcast_to(a_lin_p, (3, cm.K) + env)
        ap_ang = lin.mtv(R, aab) + c_ang[l]
        ap_lin = lin.mtv(R, alb + cross(aab, pjb)) + c_lin[l]
        Ua, Ul, di, u = per_level[l]
        qdd_l = di * (u - jnp.sum(Ua * ap_ang, axis=0)
                      - jnp.sum(Ul * ap_lin, axis=0))
        qdd.append(qdd_l)
        a_ang_p = ap_ang + cv["ax"][l] * qdd_l[None]
        a_lin_p = ap_lin
    return jnp.concatenate([a0_ang, a0_lin], axis=0), jnp.stack(qdd)


# ------------------------------------------------------------- integrate

def integrate_chain(cc: ChainConsts, cv, pos, quat, vel, q, qd, a0, qdd):
    dt = cc.dt_inner
    vel = vel + dt * a0
    vel = jnp.concatenate([
        jnp.clip(vel[0:3], -cc.base_ang_cap, cc.base_ang_cap),
        jnp.clip(vel[3:6], -cc.base_lin_cap, cc.base_lin_cap)], axis=0)
    cap = cv["qd_cap"]
    qd = jnp.clip(qd + dt * qdd, -cap, cap)
    pos = pos + dt * quat_ops.rotate(quat, vel[3:6])
    # quaternion integrate with explicit normalization (jnp.linalg.norm
    # doesn't lower inside Mosaic kernels)
    dq = jnp.concatenate([vel[0:3] * (0.5 * dt),
                          jnp.ones_like(quat[3:4])], axis=0)
    quat = quat_ops.mul(quat, dq)
    inv = 1.0 / jnp.sqrt(jnp.sum(quat * quat, axis=0).clip(1e-18))
    quat = quat * inv[None]
    q = q + dt * qd
    # hard-limit plastic projection (see integrator.integrate: the
    # limit-spring catapult measured on aliengo)
    lo, hi = cv["lower"], cv["upper"]
    qd = jnp.where((q > hi) & (qd > 0.0), 0.0, qd)
    qd = jnp.where((q < lo) & (qd < 0.0), 0.0, qd)
    q = jnp.clip(q, lo, hi)
    return pos, quat, vel, q, qd


# ------------------------------------------------------------ full step

def pd_tau(cc: ChainConsts, cv, targets, q, qd):
    lim = cv["effort"]
    return jnp.clip(cv["kp"] * (targets - q) - cv["kd_eff"] * qd,
                    -lim, lim)


def limit_spring(cc: ChainConsts, cv, q, qd):
    """Joint-limit spring-damper torque + implicit diagonal bump
    (engine._substep semantics)."""
    dtype = q.dtype
    over = jnp.maximum(q - cv["upper"], 0.0)
    under = jnp.maximum(cv["lower"] - q, 0.0)
    active = ((over > 0) | (under > 0)).astype(dtype)
    tau = cc.limit_stiffness * (under - over) \
        - cc.limit_damping * active * qd
    extra = cc.dt_inner * (cc.limit_damping
                           + cc.dt_inner * cc.limit_stiffness) * active
    return tau, extra


def wrenches_from_forces(cc: ChainConsts, fk, pts, forces):
    """Accumulate world contact wrenches per entity.
    Returns (f_base (3,N), n_base (3,N), f_lvl list (3,K,N), n_lvl)."""
    cm = cc.cm
    env = fk["p0"].shape[1:]
    dtype = fk["p0"].dtype
    f_base = jnp.zeros((3,) + env, dtype)
    n_base = jnp.zeros((3,) + env, dtype)
    f_lvl = [jnp.zeros((3, cm.K) + env, dtype) for _ in range(cm.L)]
    n_lvl = [jnp.zeros((3, cm.K) + env, dtype) for _ in range(cm.L)]
    for g, (ppos, _), f in zip(cm.groups, pts, forces):
        if g.level < 0:
            arm = ppos - fk["p0"][:, None, None]
            trq = cross(arm, f)
            f_base = f_base + jnp.sum(f, axis=(1, 2))
            n_base = n_base + jnp.sum(trq, axis=(1, 2))
        else:
            l = g.level
            arm = ppos - fk["p_w"][l][:, None]
            trq = cross(arm, f)
            f_lvl[l] = f_lvl[l] + jnp.sum(f, axis=1)
            n_lvl[l] = n_lvl[l] + jnp.sum(trq, axis=1)
    return f_base, n_base, f_lvl, n_lvl


def _body_runs(g):
    """Host-side: contiguous slot runs [s0, s1) of the same report body,
    per chain: list of (s0, s1, k, body). Lets the sensor accumulation be
    a few range-sums instead of one slice per point."""
    runs = []
    S, K = g.body.shape
    for k in range(K):
        s = 0
        while s < S:
            if not g.active[s, k]:
                s += 1
                continue
            b = int(g.body[s, k])
            s1 = s + 1
            while s1 < S and g.active[s1, k] and int(g.body[s1, k]) == b:
                s1 += 1
            runs.append((s, s1, k, b))
            s = s1
    return runs


def compute_plane(cc: ChainConsts, cv, fk, ph, pr0, pc0):
    """Sample the terrain under every contact point and return the local
    contact planes: list per group of plane_consts() tuples."""
    plane = []
    for gi in range(len(cc.cm.groups)):
        ppos, _ = contact_points_group(cc, cv, fk, gi)
        x, y = ppos[0], ppos[1]
        h, dhdx, dhdy = sample_patch_plane(cc, cv, ph, pr0, pc0, x, y)
        plane.append(plane_consts(cc, cv, gi, h, dhdx, dhdy, x, y))
    return plane


def one_sim_dt(cc: ChainConsts, cv, lp_base, lp_lvl, mu_env, targets,
               ph, pr0, pc0, state5, plane=None, anchors=None):
    """One sim dt = `substeps` inner substeps with a contact plane cached
    at the first substep (PhysX persistent-manifold analog) — or reused
    from `plane` (per-policy-step cadence). Shared body of the plain-JAX
    path and the Pallas kernel.

    anchors: per-group list of (3,S,K,N) static-friction anchor
    positions when ``cc.warm_start`` (threaded through substeps and
    returned), else None.

    Returns (state5', tau (L,K,N) last substep,
             body_f (3, n_bodies, N) net contact forces (last substep)
             [, anchors' when cc.warm_start])."""
    cm = cc.cm
    pos, quat, vel, q, qd = state5
    tau_out = None
    body_f_out = None
    own_plane = plane is None
    if own_plane:
        plane = [None] * len(cm.groups)
    track_anchors = cc.warm_start and anchors is not None
    if track_anchors:
        anchors = list(anchors)
    has_damping = bool(np.any(cm.damping != 0.0))
    for s in range(cc.substeps):
        fk = fk_chain(cc, cv, pos, quat, vel, q, qd)
        env = fk["p0"].shape[1:]
        dtype = fk["p0"].dtype
        # per-group fused pipeline (points -> sample -> force -> wrench)
        # so only one group's kinematic temps are live at a time — the
        # Pallas kernel is VMEM-budget-bound
        f_base = jnp.zeros((3,) + env, dtype)
        n_base = jnp.zeros((3,) + env, dtype)
        f_lvl = [jnp.zeros((3, cm.K) + env, dtype) for _ in range(cm.L)]
        n_lvl = [jnp.zeros((3, cm.K) + env, dtype) for _ in range(cm.L)]
        # per-report-body force accumulators (the net_contact_force
        # sensor, reference legged_robot.py:115,509) — contiguous
        # slot-runs of the same body are range-summed, no scatters
        body_cols = [None] * cm.n_bodies
        for gi, g in enumerate(cm.groups):
            ppos, pvel = contact_points_group(cc, cv, fk, gi)
            if own_plane and s == 0:
                x, y = ppos[0], ppos[1]
                h, dhdx, dhdy = sample_patch_plane(cc, cv, ph, pr0, pc0,
                                                   x, y)
                plane[gi] = plane_consts(cc, cv, gi, h, dhdx, dhdy, x, y)
            if track_anchors:
                f, anchors[gi] = contact_force_from_plane(
                    cc, cv, gi, plane[gi], ppos, pvel, mu_env,
                    anchor=anchors[gi])
            else:
                f = contact_force_from_plane(cc, cv, gi, plane[gi], ppos,
                                             pvel, mu_env)
            for (s0, s1, k, b) in _body_runs(g):
                fr = jax.lax.slice_in_dim(f, s0, s1, axis=1)
                fr = jnp.sum(fr, axis=1) if s1 - s0 > 1 else fr[:, 0]
                col = (jax.lax.index_in_dim(fr, k, axis=1,
                                            keepdims=False)
                       if fr.shape[1] > 1 else fr[:, 0])
                body_cols[b] = (col if body_cols[b] is None
                                else body_cols[b] + col)
            if g.level < 0:
                arm = ppos - fk["p0"][:, None, None]
                f_base = f_base + jnp.sum(f, axis=(1, 2))
                n_base = n_base + jnp.sum(cross(arm, f), axis=(1, 2))
            else:
                l = g.level
                arm = ppos - fk["p_w"][l][:, None]
                f_lvl[l] = f_lvl[l] + jnp.sum(f, axis=1)
                n_lvl[l] = n_lvl[l] + jnp.sum(cross(arm, f), axis=1)
        zero3 = jnp.zeros((3,) + env, dtype)
        body_f = jnp.stack([c if c is not None else zero3
                            for c in body_cols], axis=1)  # (3, nb, env)

        if cc.torque_mode:
            tau = jnp.clip(targets, -cv["effort"], cv["effort"])
        else:
            tau = pd_tau(cc, cv, targets, q, qd)
        tau_lim, extra = limit_spring(cc, cv, q, qd)
        tau_total = tau + tau_lim
        if has_damping:
            tau_total = tau_total - cv["damping"] * qd
        imp = cv["implicit_d"] + extra
        a0, qdd = aba_chain(cc, cv, lp_base, lp_lvl, fk, qd,
                            tau_total, f_base, n_base,
                            f_lvl, n_lvl, imp)
        pos, quat, vel, q, qd = integrate_chain(
            cc, cv, pos, quat, vel, q, qd, a0, qdd)
        tau_out = tau
        body_f_out = body_f
    if track_anchors:
        return (pos, quat, vel, q, qd), tau_out, body_f_out, anchors
    return (pos, quat, vel, q, qd), tau_out, body_f_out


def run_decimation_chain(cc: ChainConsts, lp_base, lp_lvl, mu_env,
                         targets, ph, pr0, pc0,
                         pos, quat, vel, q, qd, cv=None, anchors=None):
    """The full policy-step physics: decimation x substeps inner loop,
    position drive. Pure function of arrays; the Pallas kernel runs the
    same one_sim_dt body under a fori_loop.

    Returns (pos, quat, vel, q, qd, tau_last (L,K,N),
             body_f_last (3, n_bodies, N) [, anchors' when
             cc.warm_start and anchors given])."""
    if cv is None:
        cv = {k: jnp.asarray(v)
              for k, v in const_values(cc, env_nd=pos.ndim - 1).items()}
    state5 = (pos, quat, vel, q, qd)
    plane = None
    if cc.plane_per_step:
        fk0 = fk_chain(cc, cv, pos, quat, vel, q, qd)
        plane = compute_plane(cc, cv, fk0, ph, pr0, pc0)
    tau_last = None
    body_f_last = None
    track_anchors = cc.warm_start and anchors is not None
    for _dec in range(cc.decimation):
        out = one_sim_dt(
            cc, cv, lp_base, lp_lvl, mu_env, targets, ph, pr0, pc0,
            state5, plane=plane, anchors=anchors)
        if track_anchors:
            state5, tau_last, body_f_last, anchors = out
        else:
            state5, tau_last, body_f_last = out
    if track_anchors:
        return state5 + (tau_last, body_f_last, anchors)
    return state5 + (tau_last, body_f_last)
