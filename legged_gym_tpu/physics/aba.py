"""Featherstone articulated-body algorithm (ABA), floating base, batch-last.

The TPU-native replacement for PhysX's articulated-dynamics solve
(reference: ``gym.simulate`` at legged_robot.py:96). Written entirely in
3x3-block form (ops/lin.py) so every operation is an elementwise
multiply-add over the trailing env axis — full vector-lane occupancy, no
tiny batched matmuls for XLA to pad onto the MXU.

Algorithm: RBDA (Featherstone 2008) Table 7.1 adapted to a 6-dof floating
base (sec. 9.4): the base acceleration solves I^A_0 a_0 = -p^A_0 via a
symmetric 6x6 block Schur solve.

Spatial conventions: motion vectors (omega, v) in link coordinates at the
link origin; articulated inertia I^A = [[A, B], [B^T, C]] with A = angular
block, C = mass block. Gravity and contacts enter as external wrenches, so
no fictitious-acceleration bookkeeping.
"""
from __future__ import annotations

import jax.numpy as jnp

from legged_gym_tpu.ops import lin
from legged_gym_tpu.ops.quat import cross


def _inertia_blocks(params):
    """(10, N) spatial-inertia params -> (m (N,), h (3,N), A (3,3,N))."""
    m = params[0]
    h = params[1:4]
    A = jnp.stack([
        jnp.stack([params[4], params[5], params[6]]),
        jnp.stack([params[5], params[7], params[8]]),
        jnp.stack([params[6], params[8], params[9]]),
    ])
    return m, h, A


def aba(model, inertia_params, fk, qd, tau, f_ext_w=None, n_ext_w=None,
        gravity=(0.0, 0.0, -9.81), fixed_base=False, implicit_d=None):
    """Forward dynamics.

    Args:
      model: RobotModel (host constants).
      inertia_params: (nl, 10, N) per-env spatial inertias (DR-randomized).
      fk: kinematics.FK for the current state.
      qd: (nq, N) joint velocities.
      tau: (nq, N) joint torques (drive + damping already included).
      f_ext_w / n_ext_w: optional (nl, 3, N) external force / torque about
        each link origin, world frame (contact forces).
      gravity: world gravity vector.
      implicit_d: optional (nq,) or (nq, N) extra joint-space diagonal added
        to D. Passing dt*(kd + dt*kp + joint_damping) makes PD damping
        unconditionally stable (the implicit-drive trick PhysX's TGS solver
        performs internally; explicit damping diverges when kd*dt exceeds
        twice the apparent joint inertia of the light distal links).

    Returns:
      (a_base (6, N) base-frame spatial acceleration, qdd (nq, N)).
    """
    nq, nl = model.nq, model.nl
    dtype = fk.p_w[0].dtype
    g_w = jnp.asarray(gravity, dtype)[:, None]

    # --- pass 1: velocities are in fk; init articulated inertia + bias ---
    IA_A = [None] * nl   # angular block (3,3,N)
    IA_B = [None] * nl   # coupling block (3,3,N)  (top-right, = skew(h) init)
    IA_C = [None] * nl   # linear block (3,3,N)
    pA_n = [None] * nl   # bias wrench, angular (3,N)
    pA_f = [None] * nl   # bias wrench, linear (3,N)
    c_ang = [None] * nq
    c_lin = [None] * nq

    for li in range(nl):
        m, h, A = _inertia_blocks(inertia_params[li])
        hS = lin.skew(h)
        IA_A[li] = A
        IA_B[li] = hS
        IA_C[li] = m[None, None] * lin.eye(m.shape, dtype)

        w, v = fk.v_ang[li], fk.v_lin[li]
        # momentum: n_m = A w + h x v ; f_m = m v - h x w
        n_m = lin.mv(A, w) + cross(h, v)
        f_m = m[None] * v - cross(h, w)
        # bias: v x* (I v) = (w x n_m + v x f_m, w x f_m)
        pA_n[li] = cross(w, n_m) + cross(v, f_m)
        pA_f[li] = cross(w, f_m)
        # external: gravity at com + contacts, world -> link coords
        g_l = lin.mtv(fk.R_w[li], g_w)
        f_tot = m[None] * g_l
        n_tot = cross(h, g_l)
        if f_ext_w is not None:
            f_tot = f_tot + lin.mtv(fk.R_w[li], f_ext_w[li])
            n_tot = n_tot + lin.mtv(fk.R_w[li], n_ext_w[li])
        pA_n[li] = pA_n[li] - n_tot
        pA_f[li] = pA_f[li] - f_tot

    # velocity-product accelerations c_j = v_child x (S qd)
    for j in range(nq):
        li = j + 1
        axis = jnp.asarray(model.joint_axis[j], dtype)[:, None]
        if model.joint_is_prismatic[j]:
            Sqd_lin = axis * qd[j][None]
            Sqd_ang = jnp.zeros_like(Sqd_lin)
        else:
            Sqd_ang = axis * qd[j][None]
            Sqd_lin = jnp.zeros_like(Sqd_ang)
        w, v = fk.v_ang[li], fk.v_lin[li]
        c_ang[j] = cross(w, Sqd_ang)
        c_lin[j] = cross(w, Sqd_lin) + cross(v, Sqd_ang)

    # --- pass 2: inward sweep ---
    U_ang = [None] * nq
    U_lin = [None] * nq
    d_inv = [None] * nq
    u_bias = [None] * nq

    for j in range(nq - 1, -1, -1):
        li = j + 1
        pi = int(model.link_parent[li])
        axis3 = jnp.asarray(model.joint_axis[j], dtype)[:, None]
        A, B, C = IA_A[li], IA_B[li], IA_C[li]

        if model.joint_is_prismatic[j]:
            Ua = lin.mv(B, axis3)
            Ul = lin.mv(C, axis3)
            D = jnp.sum(axis3 * Ul, axis=0) + float(model.armature[j])
            u = tau[j] - jnp.sum(axis3 * pA_f[li], axis=0)
        else:
            Ua = lin.mv(A, axis3)
            Ul = lin.mtv(B, axis3)
            D = jnp.sum(axis3 * Ua, axis=0) + float(model.armature[j])
            u = tau[j] - jnp.sum(axis3 * pA_n[li], axis=0)
        if implicit_d is not None:
            D = D + implicit_d[j]

        di = 1.0 / D
        U_ang[j], U_lin[j], d_inv[j], u_bias[j] = Ua, Ul, di, u

        # Ia = I^A - U d^-1 U^T
        Ia_A = A - di[None, None] * lin.outer(Ua, Ua)
        Ia_B = B - di[None, None] * lin.outer(Ua, Ul)
        Ia_C = C - di[None, None] * lin.outer(Ul, Ul)
        # pa = p^A + Ia c + U d^-1 u
        pa_n = (pA_n[li] + lin.mv(Ia_A, c_ang[j]) + lin.mv(Ia_B, c_lin[j])
                + Ua * (di * u)[None])
        pa_f = (pA_f[li] + lin.mtv(Ia_B, c_ang[j]) + lin.mv(Ia_C, c_lin[j])
                + Ul * (di * u)[None])

        # transform to parent frame: child pose (R, p) in parent coords
        R, p = fk.R_loc[j], fk.p_loc[j]
        pT = lin.skew(p)
        RA = lin.mm(R, lin.mmt(Ia_A, R))     # R A R^T
        RB = lin.mm(R, lin.mmt(Ia_B, R))
        RC = lin.mm(R, lin.mmt(Ia_C, R))
        A_p = RA - lin.mm(RB, pT) + lin.mm(pT, lin.transpose(RB)) - lin.mm(pT, lin.mm(RC, pT))
        B_p = RB + lin.mm(pT, RC)
        C_p = RC
        Rf = lin.mv(R, pa_f)
        n_p = lin.mv(R, pa_n) + cross(p, Rf)

        IA_A[pi] = IA_A[pi] + A_p
        IA_B[pi] = IA_B[pi] + B_p
        IA_C[pi] = IA_C[pi] + C_p
        pA_n[pi] = pA_n[pi] + n_p
        pA_f[pi] = pA_f[pi] + Rf

    # --- base acceleration: I^A_0 a_0 = -p^A_0 ---
    if fixed_base:
        a0_ang = jnp.zeros_like(pA_n[0])
        a0_lin = jnp.zeros_like(pA_f[0])
    else:
        a0_ang, a0_lin = lin.solve66_sym(
            IA_A[0], IA_B[0], IA_C[0], -pA_n[0], -pA_f[0])

    # --- pass 3: outward sweep ---
    a_ang = [None] * nl
    a_lin = [None] * nl
    a_ang[0], a_lin[0] = a0_ang, a0_lin
    qdd = [None] * nq
    for j in range(nq):
        li = j + 1
        pi = int(model.link_parent[li])
        R, p = fk.R_loc[j], fk.p_loc[j]
        ap_ang = lin.mtv(R, a_ang[pi])
        ap_lin = lin.mtv(R, a_lin[pi] + cross(a_ang[pi], p))
        ap_ang = ap_ang + c_ang[j]
        ap_lin = ap_lin + c_lin[j]
        num = u_bias[j] - (jnp.sum(U_ang[j] * ap_ang, axis=0)
                           + jnp.sum(U_lin[j] * ap_lin, axis=0))
        qdd_j = d_inv[j] * num
        qdd[j] = qdd_j
        axis3 = jnp.asarray(model.joint_axis[j], dtype)[:, None]
        if model.joint_is_prismatic[j]:
            a_ang[li] = ap_ang
            a_lin[li] = ap_lin + axis3 * qdd_j[None]
        else:
            a_ang[li] = ap_ang + axis3 * qdd_j[None]
            a_lin[li] = ap_lin

    qdd_arr = (jnp.stack(qdd) if nq
               else jnp.zeros((0,) + a0_ang.shape[1:], dtype))
    return jnp.concatenate([a0_ang, a0_lin], axis=0), qdd_arr
