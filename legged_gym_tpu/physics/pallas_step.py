"""The physics mega-kernel: a full policy step of articulated dynamics
(decimation x substeps of FK + contact + ABA + integration) as ONE Pallas
TPU kernel, state resident in VMEM throughout.

Why: the physics is dependency-chain-bound — hundreds of tiny elementwise
ops per substep. Under plain XLA each fusion boundary round-trips HBM and
the loop costs ~4.3 ms at 1800 envs; fused, the device-side compute is
nearly free and the cost is launch + data movement.

CRITICAL data-movement rule (measured with jax.profiler): padding the
env axis to a block multiple and slicing it back dominated everything —
2.3 of 3.0 ms/step went to the XLA dynamic-update-slice/slice fusions
around the kernel. So this kernel takes FULL arrays as single blocks
(any env count is legal when block == array) and tiles the env axis
itself: an in-kernel Python loop over 128-aligned lane chunks keeps the
working set inside the 16 MB VMEM budget. Chunks are independent robots,
so each runs the whole decimation loop privately. No HBM-side padding,
slicing, or grid machinery anywhere.

Reference correspondence: this kernel IS our ``gym.simulate``
(legged_robot.py:96) — the one true custom-kernel hot spot called out in
SURVEY.md section 7 step 3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legged_gym_tpu.physics.chain_step import (ChainConsts, compute_plane,
                                               const_values, fk_chain,
                                               one_sim_dt)

# lane-chunk size: biggest 128-multiple whose per-chunk temps keep the
# kernel inside the VMEM scoped budget. Measured on the real v5e with the
# round-2 contact law at 1920 envs: a 640-env block (G=5 sublanes) needs
# 16.06 MB scoped vmem and a 384-env block (G=3) needs MORE (18.29 MB —
# sublane padding to 8 makes padded block size nearly independent of G,
# and the extra grid steps add pipelining buffers). So blocks stay at
# 1024 lanes max and the pallas_call raises its scoped-vmem allowance
# via CompilerParams(vmem_limit_bytes) instead (v5e has 128 MB VMEM).
CHUNK = 1024


def _vmem_limit_bytes():
    """Scoped-VMEM allowance for the mega-kernel, gated by the detected
    TPU generation (ADVICE r2): v4/v5 chips carry 128 MB VMEM so a 64 MB
    scoped budget is safe; older generations (v2/v3: 16 MB) get the
    architectural default budget instead of an over-request that fails
    Mosaic compilation outright."""
    import jax
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag in ("v2", "v3"):
        if tag in kind:
            return None                 # keep the compiler default
    return 64 * 1024 * 1024


VMEM_LIMIT_BYTES = None                 # resolved lazily (first call)


def run_decimation_pallas(cc: ChainConsts, lp_base, lp_lvl, mu, targets,
                          ph, r0, c0, pos, quat, vel, q, qd,
                          interpret=False, anchors=None):
    """Same contract as chain_step.run_decimation_chain, fused on TPU.

    Shapes: lp_base (10,N), lp_lvl (L,10,K,N), mu (N,), targets (L,K,N),
    ph (S,S,N), r0/c0 (N,) int32, pos (3,N), quat (4,N), vel (6,N),
    q/qd (L,K,N). anchors (cc.warm_start only): per-group list of
    (3,S,K,N) static-friction anchors, carried through the decimation
    loop and returned as extra outputs.
    """
    cm = cc.cm
    L, K = cm.L, cm.K
    n = pos.shape[-1]
    dtype = pos.dtype
    track_anchors = cc.warm_start and anchors is not None
    anchors = list(anchors) if track_anchors else []

    if n <= CHUNK:
        nb = n                       # single full block: any size legal
    else:
        if n % 128:
            raise ValueError(
                f"pallas physics path needs num_envs % 128 == 0 above "
                f"{CHUNK} envs (got {n}); LeggedEnv rounds automatically")
        nb = 128
        for cand in range(CHUNK, 127, -128):
            if n % cand == 0:
                nb = cand
                break

    env_ins = [
        lp_base,
        lp_lvl,
        mu.reshape(1, n).astype(dtype),
        targets,
        ph,
        r0.reshape(1, n).astype(dtype),
        c0.reshape(1, n).astype(dtype),
        pos, quat, vel, q, qd,
    ] + anchors

    # array constants go in as (replicated) inputs — Pallas kernels can't
    # capture array constants. env_nd=2: the kernel splits each block's
    # env axis into (G, 128) — without the split, (K, nb) tiles pad
    # sublanes 4 -> 8 and the block blows the VMEM budget
    G = -(-nb // 128)
    cv_host = const_values(cc, env_nd=2)
    cv_keys = sorted(cv_host.keys())
    const_ins = [jnp.asarray(cv_host[k]) for k in cv_keys]

    def env_spec(shape):
        zeros = (0,) * (len(shape) - 1)
        return pl.BlockSpec(shape[:-1] + (nb,),
                            lambda i, _z=zeros: _z + (i,),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    in_specs = [env_spec(x.shape) for x in env_ins] + \
        [const_spec(x.shape) for x in const_ins]

    out_shapes = [
        jax.ShapeDtypeStruct((3, n), dtype),        # pos
        jax.ShapeDtypeStruct((4, n), dtype),        # quat
        jax.ShapeDtypeStruct((6, n), dtype),        # vel
        jax.ShapeDtypeStruct((L, K, n), dtype),     # q
        jax.ShapeDtypeStruct((L, K, n), dtype),     # qd
        jax.ShapeDtypeStruct((L, K, n), dtype),     # tau
        jax.ShapeDtypeStruct((3, cm.n_bodies, n), dtype),  # body_f
    ] + [jax.ShapeDtypeStruct(a.shape, dtype) for a in anchors]
    out_specs = [env_spec(s.shape) for s in out_shapes]
    n_env_in = len(env_ins)
    n_anchor = len(anchors)

    def kernel(*refs):
        env_refs = refs[:n_env_in]
        cv_refs = refs[n_env_in:n_env_in + len(const_ins)]
        out_refs = refs[n_env_in + len(const_ins):]
        (lpb, lpl, mu_r, tgt, ph_r, r0_r, c0_r,
         pos_r, quat_r, vel_r, q_r, qd_r) = env_refs[:12]
        anchor_refs = env_refs[12:]
        (pos_o, quat_o, vel_o, q_o, qd_o, tau_o, bodyf_o) = out_refs[:7]
        anchor_outs = out_refs[7:]

        cv = {k: r[...] for k, r in zip(cv_keys, cv_refs)}

        def split(a):
            """(..., nb) -> (..., G, 128) when nb is a 128-multiple,
            else (..., 1, nb) (small single-block case)."""
            if nb % 128 == 0:
                return a.reshape(a.shape[:-1] + (G, 128))
            return a.reshape(a.shape[:-1] + (1, nb))

        lp_base_v = split(lpb[...])
        lp_lvl_v = split(lpl[...])
        mu_v = split(mu_r[...])[0]
        tgt_v = split(tgt[...])
        ph_v = split(ph_r[...])
        r0_v = split(r0_r[...])[0]
        c0_v = split(c0_r[...])[0]
        state5 = tuple(split(r[...])
                       for r in (pos_r, quat_r, vel_r, q_r, qd_r))
        anchors_v = tuple(split(r[...]) for r in anchor_refs)

        if cc.plane_per_step:
            fk0 = fk_chain(cc, cv, *state5)
            plane0 = compute_plane(cc, cv, fk0, ph_v, r0_v, c0_v)

            # the plane rides the fori carry explicitly (a pre-loop
            # closure over it crashed the Mosaic compile helper)
            def body(_i, carry):
                state5, plane, anchors_c = carry
                out = one_sim_dt(
                    cc, cv, lp_base_v, lp_lvl_v, mu_v, tgt_v,
                    ph_v, r0_v, c0_v, state5, plane=plane,
                    anchors=anchors_c if n_anchor else None)
                if n_anchor:
                    state5, tau, body_f, anchors_c = out
                    anchors_c = tuple(anchors_c)
                else:
                    state5, tau, body_f = out
                tau_o[...] = tau.reshape(tau.shape[:-2] + (nb,))
                bodyf_o[...] = body_f.reshape(body_f.shape[:-2] + (nb,))
                return (state5, plane, anchors_c)

            state5, _, anchors_v = jax.lax.fori_loop(
                0, cc.decimation, body, (state5, plane0, anchors_v))
        else:
            def body(_i, carry):
                state5, anchors_c = carry
                out = one_sim_dt(
                    cc, cv, lp_base_v, lp_lvl_v, mu_v, tgt_v,
                    ph_v, r0_v, c0_v, state5,
                    anchors=anchors_c if n_anchor else None)
                if n_anchor:
                    state5, tau, body_f, anchors_c = out
                    anchors_c = tuple(anchors_c)
                else:
                    state5, tau, body_f = out
                tau_o[...] = tau.reshape(tau.shape[:-2] + (nb,))
                bodyf_o[...] = body_f.reshape(body_f.shape[:-2] + (nb,))
                return (state5, anchors_c)

            state5, anchors_v = jax.lax.fori_loop(
                0, cc.decimation, body, (state5, anchors_v))

        for ref, a in zip((pos_o, quat_o, vel_o, q_o, qd_o), state5):
            ref[...] = a.reshape(a.shape[:-2] + (nb,))
        for ref, a in zip(anchor_outs, anchors_v):
            ref[...] = a.reshape(a.shape[:-2] + (nb,))

    global VMEM_LIMIT_BYTES
    if VMEM_LIMIT_BYTES is None:
        VMEM_LIMIT_BYTES = _vmem_limit_bytes() or 0
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
               if VMEM_LIMIT_BYTES else pltpu.CompilerParams())
    out = pl.pallas_call(
        kernel,
        grid=(n // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=cparams,
    )(*(env_ins + const_ins))

    if track_anchors:
        return tuple(out[:7]) + (list(out[7:]),)
    return tuple(out[:6]) + (out[6],)
