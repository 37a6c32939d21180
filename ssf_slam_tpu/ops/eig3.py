"""Closed-form eigendecomposition of symmetric 3x3 matrices.

``jnp.linalg.eigh`` on a ``[F, 3, 3]`` batch lowers to XLA's iterative
eigensolver — measured ~10 ms for F=4096 on a v5e chip, dominating the
plane-fit stage of both the geometric odometry and the seg-gated flow-pose
refinement. A symmetric 3x3 has an ANALYTIC spectrum (the characteristic
cubic solved by the trigonometric method), and the eigenvector of an
isolated eigenvalue lambda3 is any nonzero column of
``(A - l1 I)(A - l2 I)`` (Cayley-Hamilton: that product annihilates the
other two eigenspaces). Everything below is elementwise VPU math — no
iteration, no data-dependent control flow.

Numerical notes:
- computed in float32 with the mean-shifted (deviatoric) form, which is the
  standard stable formulation (Smith 1961, "Eigenvalues of a symmetric 3x3
  matrix");
- near-degenerate pairs (l2 ~ l3) make the eigenvector direction
  ill-defined; callers that gate on conditioning (plane fits reject
  spread l2 < tol) never consume those directions. We still return the
  largest column of the annihilator product, which degrades gracefully.

Used by ``odometry/scan2scan.py::fit_ring_diverse_planes`` (the reference
solves A n = -1 by QR per seed, src/lidarOdometry_onlyPC.cpp:207-220; the
TLS normal is identical on valid planes and also yields the spread
eigenvalues for the conditioning gate).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def eigvals_sym3(a: Array) -> Array:
    """Eigenvalues of symmetric [..., 3, 3] matrices, ascending, closed form."""
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-20)
    b = (a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)) / safe_p[
        ..., None, None
    ]
    # det(B)/2 in closed form (B symmetric)
    b00, b11, b22 = b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]
    b01, b02, b12 = b[..., 0, 1], b[..., 0, 2], b[..., 1, 2]
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # p == 0: scalar matrix, all eigenvalues q (the formula already gives
    # that since p multiplies the cosines, but keep r well-defined)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def smallest_eigvec_sym3(a: Array) -> tuple[Array, Array]:
    """(eigenvalues ascending [..., 3], unit eigenvector [..., 3] of the
    smallest eigenvalue) for symmetric 3x3 batches, closed form.

    The eigenvector comes from the Cayley-Hamilton annihilator
    ``(A - l_mid I)(A - l_hi I)`` whose columns all lie in the smallest
    eigenspace; we take the largest column for conditioning.
    """
    evals = eigvals_sym3(a)
    eye = jnp.eye(3, dtype=a.dtype)
    m = jnp.matmul(
        a - evals[..., 1, None, None] * eye,
        a - evals[..., 2, None, None] * eye,
    )
    norms = jnp.sum(m * m, axis=-2)  # [..., 3] column sq-norms
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(m, col[..., None, None], axis=-1)[..., 0]
    # fully degenerate (scalar matrix): annihilator vanishes; any unit
    # vector is an eigenvector — fall back to e_z
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.where(n > 1e-12, v / jnp.maximum(n, 1e-20),
                  jnp.array([0.0, 0.0, 1.0], dtype=a.dtype))
    return evals, v
