"""Featherstone articulated-body algorithm (ABA), floating base — stacked,
level-parallel, batch-last.

TPU-native replacement for PhysX's articulated-dynamics solve (reference:
``gym.simulate`` at legged_robot.py:96). All quantities are stacked over
links/joints with matrix axes first and env axis last (see kinematics.py),
so the three ABA passes cost O(tree depth) sequential steps instead of
O(nq): pass 1 is a single fused block over all links; passes 2/3 walk
levels (depth 3 for a quadruped) with gather/scatter-add along the tiny
link axis. On TPU — where this workload is dependency-chain-bound, not
FLOP-bound — chain length is the whole cost model.

Algorithm: RBDA (Featherstone 2008) Table 7.1 adapted to a 6-dof floating
base (sec. 9.4): base acceleration solves I^A_0 a_0 = -p^A_0 via a
symmetric 6x6 block Schur solve. Articulated inertia kept as 3x3 blocks
[[A, B], [B^T, C]]; gravity and contacts enter as external wrenches.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from legged_gym_tpu.ops import lin
from legged_gym_tpu.ops.quat import cross
from legged_gym_tpu.physics.kinematics import tree_levels


def aba(model, inertia_params, fk, qd, tau, f_ext_w=None, n_ext_w=None,
        gravity=(0.0, 0.0, -9.81), fixed_base=False, implicit_d=None):
    """Forward dynamics.

    Args:
      model: RobotModel (host constants).
      inertia_params: (nl, 10, N) per-env spatial inertias (DR-randomized).
      fk: kinematics.FK for the current state (stacked layout).
      qd: (nq, N) joint velocities.
      tau: (nq, N) joint torques (drive + damping already included).
      f_ext_w / n_ext_w: optional (3, nl, N) external force / torque about
        each link origin, world frame (contact wrenches).
      gravity: world gravity vector.
      implicit_d: optional (nq,) or (nq, N) extra joint-space diagonal
        added to D. Passing dt*(kd + dt*kp + joint_damping) makes PD
        damping unconditionally stable (the implicit-drive trick PhysX's
        TGS solver performs internally).

    Returns:
      (a_base (6, N) base-frame spatial acceleration, qdd (nq, N)).
    """
    nq, nl = model.nq, model.nl
    dtype = fk.p_w.dtype
    g_w = jnp.asarray(gravity, dtype)[:, None, None]           # (3,1,1)

    # ---- pass 1: all links at once ----
    par = jnp.moveaxis(inertia_params, 1, 0)                   # (10, nl, N)
    m = par[0]                                                 # (nl, N)
    h = par[1:4]                                               # (3, nl, N)
    A = jnp.stack([
        jnp.stack([par[4], par[5], par[6]]),
        jnp.stack([par[5], par[7], par[8]]),
        jnp.stack([par[6], par[8], par[9]]),
    ])                                                         # (3,3,nl,N)
    IA_A = A
    IA_B = lin.skew(h)
    IA_C = m[None, None] * lin.eye(m.shape, dtype)

    w, v = fk.v_ang, fk.v_lin
    n_m = lin.mv(A, w) + cross(h, v)
    f_m = m[None] * v - cross(h, w)
    pA_n = cross(w, n_m) + cross(v, f_m)
    pA_f = cross(w, f_m)
    # external: gravity at com + contacts, world -> link coords
    g_l = lin.mtv(fk.R_w, jnp.broadcast_to(g_w, (3, nl, m.shape[-1])))
    f_tot = m[None] * g_l
    n_tot = cross(h, g_l)
    if f_ext_w is not None:
        f_tot = f_tot + lin.mtv(fk.R_w, f_ext_w)
        n_tot = n_tot + lin.mtv(fk.R_w, n_ext_w)
    pA_n = pA_n - n_tot
    pA_f = pA_f - f_tot

    # velocity-product accelerations for ALL joints at once:
    # c_j = v_child x (S qd), child link of joint j is j+1
    axes_all = jnp.asarray(model.joint_axis.T, dtype)[:, :, None]  # (3,nq,1)
    prism_all = jnp.asarray(model.joint_is_prismatic, dtype)[None, :, None]
    Sqd_ang = axes_all * (1.0 - prism_all) * qd[None]
    Sqd_lin = axes_all * prism_all * qd[None]
    wc = w[:, 1:]
    vc = v[:, 1:]
    c_ang = cross(wc, Sqd_ang)                                 # (3, nq, N)
    c_lin = cross(wc, Sqd_lin) + cross(vc, Sqd_ang)

    arm = jnp.asarray(model.armature, dtype)[:, None]          # (nq, 1)
    if implicit_d is not None:
        imp = jnp.asarray(implicit_d, dtype)
        if imp.ndim == 1:
            imp = imp[:, None]
    else:
        imp = jnp.zeros((nq, 1), dtype)

    levels = tree_levels(model)

    # ---- pass 2: inward sweep by level (deepest first) ----
    U_ang = jnp.zeros((3, nq, m.shape[-1]), dtype)
    U_lin = jnp.zeros_like(U_ang)
    d_inv = jnp.zeros((nq, m.shape[-1]), dtype)
    u_bias = jnp.zeros_like(d_inv)

    for idx in levels[::-1]:
        li = idx + 1
        pi = model.link_parent[li]
        axis3 = jnp.asarray(model.joint_axis[idx].T, dtype)[:, :, None]
        prism = jnp.asarray(model.joint_is_prismatic[idx],
                            dtype)[None, :, None]
        A_l = IA_A[:, :, li]
        B_l = IA_B[:, :, li]
        C_l = IA_C[:, :, li]
        pn_l = pA_n[:, li]
        pf_l = pA_f[:, li]

        # U = I^A S, D = S^T U, u = tau - S^T p^A (revolute/prismatic mix)
        Ua_r = lin.mv(A_l, axis3)
        Ul_r = lin.mtv(B_l, axis3)
        Ua_p = lin.mv(B_l, axis3)
        Ul_p = lin.mv(C_l, axis3)
        Ua = Ua_r * (1 - prism) + Ua_p * prism
        Ul = Ul_r * (1 - prism) + Ul_p * prism
        D = (jnp.sum(axis3 * (Ua * (1 - prism) + Ul * prism), axis=0)
             + arm[idx] + imp[idx])
        u = tau[idx] - jnp.sum(
            axis3 * (pn_l * (1 - prism) + pf_l * prism), axis=0)

        di = 1.0 / D
        U_ang = U_ang.at[:, idx].set(Ua)
        U_lin = U_lin.at[:, idx].set(Ul)
        d_inv = d_inv.at[idx].set(di)
        u_bias = u_bias.at[idx].set(u)

        # Ia = I^A - U d^-1 U^T
        Ia_A = A_l - di[None, None] * lin.outer(Ua, Ua)
        Ia_B = B_l - di[None, None] * lin.outer(Ua, Ul)
        Ia_C = C_l - di[None, None] * lin.outer(Ul, Ul)
        # pa = p^A + Ia c + U d^-1 u
        ca = c_ang[:, idx]
        cl = c_lin[:, idx]
        pa_n = pn_l + lin.mv(Ia_A, ca) + lin.mv(Ia_B, cl) + Ua * (di * u)[None]
        pa_f = pf_l + lin.mtv(Ia_B, ca) + lin.mv(Ia_C, cl) + Ul * (di * u)[None]

        # transform to parent frame: child pose (R, p) in parent coords
        R = fk.R_loc[:, :, idx]
        p = fk.p_loc[:, idx]
        pT = lin.skew(p)
        RA = lin.mm(R, lin.mmt(Ia_A, R))
        RB = lin.mm(R, lin.mmt(Ia_B, R))
        RC = lin.mm(R, lin.mmt(Ia_C, R))
        A_p = (RA - lin.mm(RB, pT) + lin.mm(pT, lin.transpose(RB))
               - lin.mm(pT, lin.mm(RC, pT)))
        B_p = RB + lin.mm(pT, RC)
        Rf = lin.mv(R, pa_f)
        n_p = lin.mv(R, pa_n) + cross(p, Rf)

        # scatter-add into parents (hips share the base: duplicate indices
        # accumulate correctly through at[].add)
        IA_A = IA_A.at[:, :, pi].add(A_p)
        IA_B = IA_B.at[:, :, pi].add(B_p)
        IA_C = IA_C.at[:, :, pi].add(RC)
        pA_n = pA_n.at[:, pi].add(n_p)
        pA_f = pA_f.at[:, pi].add(Rf)

    # ---- base acceleration: I^A_0 a_0 = -p^A_0 ----
    if fixed_base:
        a0_ang = jnp.zeros_like(pA_n[:, 0])
        a0_lin = jnp.zeros_like(pA_f[:, 0])
    else:
        a0_ang, a0_lin = lin.solve66_sym(
            IA_A[:, :, 0], IA_B[:, :, 0], IA_C[:, :, 0],
            -pA_n[:, 0], -pA_f[:, 0])

    # ---- pass 3: outward sweep by level ----
    a_ang = jnp.zeros((3, nl, m.shape[-1]), dtype)
    a_lin = jnp.zeros_like(a_ang)
    a_ang = a_ang.at[:, 0].set(a0_ang)
    a_lin = a_lin.at[:, 0].set(a0_lin)
    qdd = jnp.zeros((nq, m.shape[-1]), dtype)

    for idx in levels:
        li = idx + 1
        pi = model.link_parent[li]
        R = fk.R_loc[:, :, idx]
        p = fk.p_loc[:, idx]
        axis3 = jnp.asarray(model.joint_axis[idx].T, dtype)[:, :, None]
        prism = jnp.asarray(model.joint_is_prismatic[idx],
                            dtype)[None, :, None]

        ap_ang = lin.mtv(R, a_ang[:, pi]) + c_ang[:, idx]
        ap_lin = lin.mtv(R, a_lin[:, pi] + cross(a_ang[:, pi], p)) \
            + c_lin[:, idx]
        num = u_bias[idx] - (jnp.sum(U_ang[:, idx] * ap_ang, axis=0)
                             + jnp.sum(U_lin[:, idx] * ap_lin, axis=0))
        qdd_l = d_inv[idx] * num
        qdd = qdd.at[idx].set(qdd_l)
        a_ang = a_ang.at[:, li].set(
            ap_ang + axis3 * (1 - prism) * qdd_l[None])
        a_lin = a_lin.at[:, li].set(ap_lin + axis3 * prism * qdd_l[None])

    return jnp.concatenate([a0_ang, a0_lin], axis=0), qdd
