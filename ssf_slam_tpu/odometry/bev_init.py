"""Global translation initialization by BEV occupancy correlation.

No reference equivalent — the reference's scan-to-scan Ceres solve simply
inherits the previous frame's motion (src/lidarOdometry_onlyPC.cpp:62-63) and
silently fails when inter-frame motion exceeds the point-to-plane basin of
attraction (> ~half the feature spacing; routine at highway speed + 8192-pt
scans). This initializer makes the odometry globally convergent per frame:

1. rasterize non-ground points of both scans into a bird's-eye-view binary
   occupancy grid (walls/objects only — ground is translation-invariant and
   would flatten the correlation peak);
2. cross-correlate the grids via FFT (one 128x128 complex FFT pair — trivial
   on TPU) and take the argmax displacement within a search window.

The result seeds the Gauss-Newton point-to-plane refinement, which then
operates strictly inside its convergence basin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("cell", "half_extent", "max_shift", "n_yaw"),
)
def bev_pose_init(
    curr_xyz: Array,
    curr_mask: Array,
    last_xyz: Array,
    last_mask: Array,
    yaw_span: float = 0.1,
    n_yaw: int = 11,
    cell: float = 0.25,
    half_extent: float = 64.0,
    max_shift: float = 8.0,
    ground_z: float = -1.2,
) -> tuple[Array, Array]:
    """Joint (yaw, dx, dy) global init: BEV correlation over yaw candidates.

    curr points should already carry the warm-start rotation; the returned
    yaw is a RESIDUAL correction about z. Returns (dyaw scalar, t [3]).
    CAVEAT: near-periodic structure along a road makes the correlation
    multi-peaked, and the argmax can alias one building period away from
    the truth (observed: 0.7 m off with a confident-looking peak, and no
    in-map score statistic separates that from the stale-warm-start case) —
    so the caller treats this estimate as a HYPOTHESIS to verify by final
    registration residual, not as truth (scan_to_scan's dual-anchor solve).
    """
    yaws = jnp.linspace(-yaw_span, yaw_span, n_yaw)

    def one(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        rot = jnp.stack(
            [
                curr_xyz[:, 0] * c - curr_xyz[:, 1] * s,
                curr_xyz[:, 0] * s + curr_xyz[:, 1] * c,
                curr_xyz[:, 2],
            ],
            axis=-1,
        )
        t, score = _correlate(
            rot, curr_mask, last_xyz, last_mask, cell, half_extent,
            max_shift, ground_z,
        )
        return t, score

    ts, scores = jax.vmap(one)(yaws)
    best = jnp.argmax(scores)
    return yaws[best], ts[best]


def _correlate(
    curr_xyz, curr_mask, last_xyz, last_mask, cell, half_extent, max_shift,
    ground_z,
) -> tuple[Array, Array]:
    """Single-rotation BEV correlation. Returns (t [3], peak score)."""
    n_bins = int(2 * half_extent / cell)

    def grid(xyz, mask):
        keep = mask & (xyz[:, 2] > ground_z)
        ij = jnp.floor((xyz[:, :2] + half_extent) / cell).astype(jnp.int32)
        inb = keep & jnp.all((ij >= 0) & (ij < n_bins), axis=-1)
        ij = jnp.clip(ij, 0, n_bins - 1)
        g = jnp.zeros((n_bins, n_bins), jnp.float32)
        g = g.at[ij[:, 0], ij[:, 1]].add(inb.astype(jnp.float32))
        return jnp.minimum(g, 1.0)  # binary occupancy

    g_curr = grid(curr_xyz, curr_mask)
    g_last = grid(last_xyz, last_mask)
    f_last = jnp.fft.rfft2(g_last)
    f_curr = jnp.fft.rfft2(g_curr)
    corr = jnp.fft.irfft2(f_last * jnp.conj(f_curr), s=(n_bins, n_bins))
    k = int(max_shift / cell)
    idx = jnp.arange(n_bins)
    ring = jnp.minimum(idx, n_bins - idx)
    ok = (ring[:, None] <= k) & (ring[None, :] <= k)
    corr = jnp.where(ok, corr, -jnp.inf)
    flat = jnp.argmax(corr)
    si, sj = flat // n_bins, flat % n_bins

    # sub-cell refinement: 1-D parabolic fit through the peak and its
    # (circular) neighbors on each axis — turns the cell-quantized argmax
    # into a continuous estimate (~cell/10 accuracy)
    def parab(cm, c0, cp):
        denom = cm - 2.0 * c0 + cp
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    def at(i, j):
        v = corr[i % n_bins, j % n_bins]
        return jnp.where(jnp.isfinite(v), v, corr[si, sj])

    off_i = parab(at(si - 1, sj), corr[si, sj], at(si + 1, sj))
    off_j = parab(at(si, sj - 1), corr[si, sj], at(si, sj + 1))

    dx = (jnp.where(si > n_bins // 2, si - n_bins, si) + off_i) * cell
    dy = (jnp.where(sj > n_bins // 2, sj - n_bins, sj) + off_j) * cell
    t = jnp.array([1.0, 0.0, 0.0]) * dx + jnp.array([0.0, 1.0, 0.0]) * dy
    return t, corr[si, sj]


@functools.partial(
    jax.jit, static_argnames=("cell", "half_extent", "max_shift")
)
def bev_translation_init(
    curr_xyz: Array,
    curr_mask: Array,
    last_xyz: Array,
    last_mask: Array,
    cell: float = 0.5,
    half_extent: float = 64.0,
    max_shift: float = 8.0,
    ground_z: float = -1.2,
) -> Array:
    """Estimate the [dx, dy, 0] shifting CURR points onto LAST points.

    Points should already be rotated by the best-known relative rotation.
    Returns t [3] such that curr + t aligns with last (z left to the GN).
    """
    n_bins = int(2 * half_extent / cell)

    def grid(xyz, mask):
        keep = mask & (xyz[:, 2] > ground_z)
        ij = jnp.floor((xyz[:, :2] + half_extent) / cell).astype(jnp.int32)
        inb = keep & jnp.all((ij >= 0) & (ij < n_bins), axis=-1)
        ij = jnp.clip(ij, 0, n_bins - 1)
        g = jnp.zeros((n_bins, n_bins), jnp.float32)
        g = g.at[ij[:, 0], ij[:, 1]].add(inb.astype(jnp.float32))
        return jnp.minimum(g, 1.0)  # binary occupancy

    g_curr = grid(curr_xyz, curr_mask)
    g_last = grid(last_xyz, last_mask)

    # circular cross-correlation: corr[s] = sum_x g_last[x] * g_curr[x - s]
    f_last = jnp.fft.rfft2(g_last)
    f_curr = jnp.fft.rfft2(g_curr)
    corr = jnp.fft.irfft2(f_last * jnp.conj(f_curr), s=(n_bins, n_bins))

    # restrict to plausible shifts (wrap-around aliases masked out)
    k = int(max_shift / cell)
    idx = jnp.arange(n_bins)
    ring = jnp.minimum(idx, n_bins - idx)  # circular distance from 0
    ok = (ring[:, None] <= k) & (ring[None, :] <= k)
    corr = jnp.where(ok, corr, -jnp.inf)

    flat = jnp.argmax(corr)
    si, sj = flat // n_bins, flat % n_bins
    # unwrap circular shifts to signed displacements
    dx = jnp.where(si > n_bins // 2, si - n_bins, si).astype(jnp.float32) * cell
    dy = jnp.where(sj > n_bins // 2, sj - n_bins, sj).astype(jnp.float32) * cell
    return jnp.array([1.0, 0.0, 0.0]) * dx + jnp.array([0.0, 1.0, 0.0]) * dy
