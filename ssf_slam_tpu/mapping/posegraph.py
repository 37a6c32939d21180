"""Batch Gauss-Newton pose-graph optimization.

TPU-native replacement for GTSAM iSAM2 (src/mapOptmization.cpp:61-65,280-293).
iSAM2's incremental Bayes-tree relinearization is pointer-heavy and
sequentially dependent — the wrong shape for XLA. But the graph here is small
(<= max_keyframes nodes, a chain + a handful of loop factors), and iSAM2's
answer equals the batch nonlinear least-squares optimum it incrementally
tracks; so on every loop event we run a full batch GN over all keyframes.
Without loop factors the optimum is the odometry-composed chain itself (the
reference's iSAM update is a no-op then), which ``mapping_step`` exploits by
skipping the solve.

Factors (matching mapOptmization.cpp):
- prior on node 0 (:151-153) — realized by freezing node 0 (gauge fix);
- between factors on consecutive keyframes with the odometry-measured
  relative pose, noise vars rot 1e-6 / trans 1e-4 (:160-162);
- loop between factors with ICP-fitness-scaled isotropic noise (:268-274).

Linearization uses jax.jacfwd over per-node right-perturbation deltas —
exact Jacobians of the residual at the current estimate, no hand-derived
adjoint formulas to get wrong. The dense (6K)^2 normal-equation solve is
milliseconds on the MXU at K=512 and runs only on loop closures.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops.precision import GEOM
from ssf_slam_tpu.ops.se3 import (
    pose_between,
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    so3_exp_quat,
    so3_log_quat,
)

Array = jax.Array


def _retract(q: Array, t: Array, delta: Array) -> tuple[Array, Array]:
    """Right-perturbation retraction: T' = T ∘ (Exp(dw), dt)."""
    dq = so3_exp_quat(delta[..., :3])
    q2 = quat_normalize(quat_multiply(q, dq))
    t2 = t + quat_rotate(q, delta[..., 3:])  # t' = t + R(q) dt
    return q2, t2


def _between_residual(qa, ta, qb, tb, mq, mt):
    """e = Log(m^-1 ∘ (T_a^-1 ∘ T_b)) ∈ R^6 (rot then trans)."""
    rq, rt = pose_between((qa, ta), (qb, tb))
    eq = quat_multiply(quat_conjugate(mq), rq)
    et = quat_rotate(quat_conjugate(mq), rt - mt)
    return jnp.concatenate([so3_log_quat(eq), et], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pose_graph(
    q: Array,  # [K, 4] current node rotations
    t: Array,  # [K, 3] current node translations
    active: Array,  # [K] bool — node exists
    odom_rel_q: Array,  # [K, 4] measured between (i-1 -> i); row 0 unused
    odom_rel_t: Array,  # [K, 3]
    loop_a: Array,  # [L] int32 node index (current kf of the loop)
    loop_b: Array,  # [L] int32 node index (historic kf)
    loop_rel_q: Array,  # [L, 4] measured between a -> b
    loop_rel_t: Array,  # [L, 3]
    loop_w: Array,  # [L] weight (1/fitness variance); 0 disables the factor
    odom_w_rot: float = 1e6,
    odom_w_trans: float = 1e4,
    iters: int = 8,
) -> tuple[Array, Array]:
    """Returns optimized (q [K,4], t [K,3]). Node 0 is the gauge (frozen)."""
    k = q.shape[0]
    node_idx = jnp.arange(k)
    odom_on = (active & (node_idx > 0)).astype(q.dtype)  # factor i-1 -> i
    w_odom = jnp.stack(
        [jnp.full((k,), odom_w_rot, q.dtype)] * 3
        + [jnp.full((k,), odom_w_trans, q.dtype)] * 3,
        axis=-1,
    ) * odom_on[:, None]
    w_loop = jnp.repeat(loop_w[:, None], 6, axis=-1)

    def residuals(deltas, q0, t0):
        qn, tn = _retract(q0, t0, deltas)
        # consecutive between factors
        r_odom = _between_residual(
            jnp.roll(qn, 1, axis=0), jnp.roll(tn, 1, axis=0),
            qn, tn, odom_rel_q, odom_rel_t,
        )  # [K, 6] (row 0 meaningless, weighted 0)
        # loop factors
        r_loop = _between_residual(
            qn[loop_a], tn[loop_a], qn[loop_b], tn[loop_b],
            loop_rel_q, loop_rel_t,
        )  # [L, 6]
        return r_odom, r_loop

    def gn_step(_, carry):
        q0, t0 = carry
        zero = jnp.zeros((k, 6), q.dtype)
        (r_odom, r_loop) = residuals(zero, q0, t0)
        j_odom, j_loop = jax.jacfwd(lambda d: residuals(d, q0, t0))(zero)
        # flatten factor dims: rows = residual components, cols = K*6
        jo = j_odom.reshape(-1, k * 6)
        jl = j_loop.reshape(-1, k * 6)
        ro = (r_odom * w_odom).reshape(-1)
        rl = (r_loop * w_loop).reshape(-1)
        wo = w_odom.reshape(-1)
        wl = w_loop.reshape(-1)
        h = (
            jnp.einsum("fi,fj->ij", jo * wo[:, None], jo, precision=GEOM)
            + jnp.einsum("fi,fj->ij", jl * wl[:, None], jl, precision=GEOM)
        )
        g = jo.T @ ro + jl.T @ rl
        # gauge + inactivity: huge diagonal ties node 0 and absent nodes to 0
        frozen = (node_idx == 0) | (~active)
        diag_boost = jnp.repeat(jnp.where(frozen, 1e12, 1e-6), 6)
        h = h + jnp.diag(diag_boost)
        delta = -jnp.linalg.solve(h, g).reshape(k, 6)
        return _retract(q0, t0, delta)

    return jax.lax.fori_loop(0, iters, gn_step, (q, t))
