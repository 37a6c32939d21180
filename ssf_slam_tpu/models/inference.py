"""Inference utilities for the scene-flow net.

``predict_flow_resampled`` replaces the reference's optional permutation
resampling (main_sju_occ_ros.py:196-216): the network's FPS sampling starts
at index 0, so permuting the input point order yields a diverse ensemble of
predictions; averaging them reduces sampling variance. Implemented as a vmap
over permutations — one compiled program, R parallel net evaluations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def predict_flow(model, variables, pc1: Array, pc2: Array) -> Array:
    """[B,N,3] x2 -> [B,N,3(+1)] finest-level flow."""
    flows, _ = model.apply(variables, pc1, pc2)
    return flows[0]


def predict_flow_resampled(
    model,
    variables,
    pc1: Array,  # [B, N, 3]
    pc2: Array,
    rng: Array,
    n_resample: int = 10,
) -> Array:
    """Permutation-ensemble flow prediction (averaged in original order)."""
    n = pc1.shape[1]
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n)
    )(jax.random.split(rng, n_resample))  # [R, N]

    def one(perm):
        p1 = jnp.take(pc1, perm, axis=1)
        flows, _ = model.apply(variables, p1, pc2)
        inv = jnp.argsort(perm)
        return jnp.take(flows[0], inv, axis=1)

    ens = jax.vmap(one)(perms)  # [R, B, N, C]
    return jnp.mean(ens, axis=0)
