"""Fixed-iteration Gaussian-mixture EM, jit-safe.

TPU-native replacement for ``sklearn.mixture.GaussianMixture(n_components=2)``
used by the GMM background/foreground split over [flow || xyz] 6-D features
(scripts/PointCloudOdometry_noSeg.py:97-103, main_sju_occ_ros.py:256-263).

Differences vs sklearn, by design:
- fixed iteration count (no convergence test) so the op is a static graph;
- deterministic initialization (median-seeded farthest-point) instead of
  random kmeans restarts — the split background/moving is heavily bimodal, so
  EM converges to the same partition;
- full covariance with the same 1e-6 regularization floor sklearn applies.

The caller takes the majority cluster as background, exactly like the
reference's ``Counter(all_label).most_common(1)`` (PointCloudOdometry_noSeg.py:102).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _log_gaussian(x: Array, mean: Array, chol: Array) -> Array:
    """log N(x; mean, Sigma) with Sigma = chol @ chol.T.

    x [N, D], mean [D], chol [D, D] lower -> [N].
    """
    d = x.shape[-1]
    diff = x - mean
    # solve L y = diff^T  (triangular)
    y = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
    maha = jnp.sum(y * y, axis=0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (maha + logdet + d * jnp.log(2.0 * jnp.pi))


@functools.partial(jax.jit, static_argnames=("n_components", "n_iters"))
def gmm_em(
    x: Array,
    mask: Array | None = None,
    n_components: int = 2,
    n_iters: int = 25,
    reg_covar: float = 1e-6,
) -> tuple[Array, Array, Array, Array]:
    """Full-covariance EM.

    Args:
      x: [N, D] features.
      mask: optional [N] bool validity (padded rows excluded from the fit and
        assigned by posterior anyway).
      n_components: K.
      n_iters: EM iterations (static).

    Returns:
      (labels [N] int32, resp [N, K], means [K, D], weights [K]).
    """
    n, d = x.shape
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    w_valid = mask.astype(x.dtype)
    n_valid = jnp.maximum(jnp.sum(w_valid), 1.0)

    # --- deterministic init: component 0 at the masked median (background-ish),
    # remaining components by farthest-point seeding in feature space.
    med = jnp.sum(x * w_valid[:, None], axis=0) / n_valid  # mean as median proxy
    seeds = [med]
    dist = jnp.where(mask, jnp.sum((x - med) ** 2, axis=-1), -jnp.inf)
    for _ in range(n_components - 1):
        far = x[jnp.argmax(dist)]
        seeds.append(far)
        dist = jnp.minimum(dist, jnp.where(mask, jnp.sum((x - far) ** 2, -1), -jnp.inf))
    means = jnp.stack(seeds)  # [K, D]

    var0 = jnp.sum(((x - med) ** 2) * w_valid[:, None], axis=0) / n_valid
    cov = jnp.tile(jnp.diag(var0 + reg_covar)[None], (n_components, 1, 1))
    weights = jnp.full((n_components,), 1.0 / n_components, x.dtype)
    eye = jnp.eye(d, dtype=x.dtype)

    def e_step(means, cov, weights):
        chol = jnp.linalg.cholesky(cov + reg_covar * eye[None])
        log_p = jax.vmap(lambda m, c: _log_gaussian(x, m, c))(means, chol)  # [K, N]
        log_p = log_p.T + jnp.log(jnp.maximum(weights, 1e-12))  # [N, K]
        log_norm = jax.scipy.special.logsumexp(log_p, axis=-1, keepdims=True)
        return jnp.exp(log_p - log_norm)  # resp [N, K]

    def m_step(resp):
        r = resp * w_valid[:, None]  # [N, K]
        nk = jnp.maximum(jnp.sum(r, axis=0), 1e-8)  # [K]
        means = (r.T @ x) / nk[:, None]
        diff = x[None] - means[:, None]  # [K, N, D]
        cov = jnp.einsum(
            "kn,knd,kne->kde", r.T, diff, diff,
            preferred_element_type=jnp.float32,
        ) / nk[:, None, None]
        cov = cov + reg_covar * eye[None]
        weights = nk / n_valid
        return means, cov, weights

    def body(_, carry):
        means, cov, weights = carry
        resp = e_step(means, cov, weights)
        return m_step(resp)

    means, cov, weights = jax.lax.fori_loop(0, n_iters, body, (means, cov, weights))
    resp = e_step(means, cov, weights)
    labels = jnp.argmax(resp, axis=-1).astype(jnp.int32)
    return labels, resp, means, weights


def gmm_background_mask(
    features: Array,
    mask: Array | None = None,
    n_iters: int = 25,
) -> Array:
    """[N, D] features -> [N] bool background mask (majority GMM cluster).

    Mirrors PointCloudOdometry_noSeg.py:97-103: fit 2-component GMM, take the
    most-populated cluster as background.
    """
    labels, _, _, _ = gmm_em(features, mask=mask, n_components=2, n_iters=n_iters)
    if mask is None:
        mask = jnp.ones(labels.shape, dtype=bool)
    count1 = jnp.sum(jnp.where(mask, labels, 0))
    n_valid = jnp.sum(mask)
    bg_label = jnp.where(count1 * 2 > n_valid, 1, 0)
    return (labels == bg_label) & mask
