"""Masked/weighted Kabsch rigid alignment (SVD).

TPU-native replacement for ``slove_RT_by_SVD`` in the reference front-ends
(scripts/PointCloudOdometry.py:15-33, scripts/PointCloudOdometry_noSeg.py:19-37,
main_sju_occ_ros.py:455+): finds (R, t) minimizing sum_i w_i |R src_i + t - dst_i|^2,
with determinant correction for reflections. The reference selects static
points by boolean indexing (dynamic shape); here selection is a weight/mask
vector, keeping shapes static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops.precision import GEOM

Array = jax.Array


def kabsch(
    src: Array, dst: Array, weights: Array | None = None
) -> tuple[Array, Array]:
    """Rigid fit dst ~= R @ src + t.

    Args:
      src, dst: [..., N, 3] corresponding points.
      weights:  optional [..., N] nonneg weights (boolean masks welcome).

    Returns:
      (R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    src_mean = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    dst_mean = jnp.sum(dst * w, axis=-2, keepdims=True) / wsum
    src_c = src - src_mean
    dst_c = dst - dst_mean
    # 3x3 cross-covariance H = src_c^T diag(w) dst_c  (MXU einsum)
    h = jnp.einsum(
        "...nc,...nd->...cd", src_c * w, dst_c,
        preferred_element_type=jnp.float32,
        precision=GEOM,
    )
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(jnp.einsum("...dc,...ce->...de", jnp.swapaxes(vt, -1, -2),
                                    jnp.swapaxes(u, -1, -2), precision=GEOM))
    # reflection fix: flip the smallest singular direction
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = jnp.einsum("...dc,...c,...ce->...de",
                   jnp.swapaxes(vt, -1, -2), d, jnp.swapaxes(u, -1, -2),
                   precision=GEOM)
    t = dst_mean[..., 0, :] - jnp.einsum("...de,...e->...d", r, src_mean[..., 0, :],
                                         precision=GEOM)
    return r, t
