"""Scan-to-submap refinement support: local plane fits on ring-less clouds.

The odometry front-end fits planes with the reference's ring-diverse 5-point
rule (odometry/scan2scan.py, src/lidarOdometry_onlyPC.cpp:180-232), which
needs per-point scan-ring ids. A keyframe SUBMAP — the union of several
keyframe clouds warped into the map frame (mapping/keyframes.py::
_build_submap, mapOptmization.cpp:201-223) — has no usable ring structure:
points from different scans interleave. This module fits total-least-squares
planes on plain k-NN neighborhoods instead, with the same conditioning gates
the ring-diverse fit applies (spread + thickness), so the scan-to-map
Gauss-Newton (reused from ``scan_to_scan``) gets the same PlaneModel
contract.

The reference has no scan-to-map stage at all — its mapOptmization node only
gates keyframes and closes loops; between loop events the map pose is pure
integrated odometry (mapOptmization.cpp:450). Registering each new keyframe
against the recent submap turns per-frame drift accumulation into
per-keyframe-hop accumulation, which is what rescues straight-corridor
scenes where single-pair registration is weakly observable along the road
axis (see OdometryConfig prior notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.odometry.scan2scan import PlaneModel
from ssf_slam_tpu.ops.eig3 import smallest_eigvec_sym3
from ssf_slam_tpu.ops.knn import knn
from ssf_slam_tpu.ops.precision import GEOM

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("k",))
def fit_local_planes(
    pts: Array,
    mask: Array,
    k: int = 8,
    spread_min: float = 1e-3,
    thickness_max: float = 0.05,
) -> PlaneModel:
    """Masked TLS plane per point from its k-NN neighborhood.

    Gates (mirroring the ring-diverse fit's validity contract):
      - >= 4 valid neighbors (a 3-point fit is exactly determined — no
        planarity evidence);
      - middle eigenvalue > spread_min: the neighborhood spans two
        directions, otherwise the normal is arbitrary (near-collinear);
      - smallest eigenvalue < thickness_max^2: rms out-of-plane scatter
        below thickness_max meters (the coplanarity gate's role,
        cpp:221-232, expressed statistically since there is no ordered
        5-point chain here).
    """
    # no re-rank: the TLS fit consumes the neighborhood as an unordered
    # set, so approx_max_k's relaxed ordering costs nothing but the exact
    # candidate re-rank's gather does (ops/knn.py)
    d, idx = knn(pts, pts, k, points_mask=mask, approx=True, rerank=False)
    nb = pts[idx]  # [N, k, 3]
    w = mask[idx].astype(pts.dtype)  # [N, k]
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)  # [N, 1]
    mean = jnp.sum(nb * w[..., None], axis=1, keepdims=True) / wsum[..., None]
    c = nb - mean
    cov = jnp.einsum(
        "nkc,nkd->ncd", c * w[..., None], c, precision=GEOM
    ) / wsum[..., None]
    evals, normal = smallest_eigvec_sym3(cov)  # ascending, closed form
    valid = (
        mask
        & (jnp.sum(w, axis=-1) >= 4)
        & (evals[..., 1] > spread_min)
        & (evals[..., 0] < thickness_max**2)
    )
    return PlaneModel(normal=normal, valid=valid)
