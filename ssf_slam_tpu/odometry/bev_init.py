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
    static_argnames=("cell", "half_extent", "max_shift", "n_yaw",
                     "plaus_gate", "plaus_rel"),
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
    pred_t: Array | None = None,
    plaus_gate: float = 0.0,
    plaus_rel: float = 0.85,
) -> tuple[Array, Array]:
    """Joint (yaw, dx, dy) global init: BEV correlation over yaw candidates.

    curr points should already carry the warm-start rotation; the returned
    yaw is a RESIDUAL correction about z. Returns (dyaw scalar, t [3]).

    CAVEAT + its fix: near-periodic structure along a road makes the
    correlation multi-peaked, and the argmax can alias one building period
    away from the truth (observed: 0.7 m off with a confident-looking
    peak). When ``pred_t`` (the constant-velocity prediction) is given with
    ``plaus_gate`` > 0, the DYNAMICS of the platform disambiguate IN-MAP:
    real vehicles cannot deviate from their one-frame prediction by
    ``plaus_gate`` (0.4 m at 10 Hz = 40 m/s^2), so if the global argmax is
    implausible while a peak inside the plausibility window scores at least
    ``plaus_rel`` of it (an alias leaves the truth peak within counting
    noise of the winner — measured), the windowed peak is returned instead.
    This is deliberately a CORRELATION-level rule: arbitrating at the
    solve level (picking the warm-anchored GN solution instead) measurably
    compounds in dynamic scenes — a slow-mover-latched warm solve stays
    inside any dynamics gate and drags the trajectory (0.088 -> 1.31 m ATE
    on a 6-slow-mover street when that was tried); the windowed BEV peak is
    still measured against the whole static map every frame, so its errors
    stay per-frame independent. The window is skipped while no velocity
    exists (|pred_t| < 0.05 m: first motion frame, standstill) — there the
    global argmax IS the rescue for an unknown warm start.
    """
    yaws = jnp.linspace(-yaw_span, yaw_span, n_yaw)
    windowed = pred_t is not None and plaus_gate > 0.0

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
        return _correlate(
            rot, curr_mask, last_xyz, last_mask, cell, half_extent,
            max_shift, ground_z,
            pred_t=pred_t if windowed else None, plaus_gate=plaus_gate,
        )

    if not windowed:
        t_g, s_g = jax.vmap(one)(yaws)
        return yaws[jnp.argmax(s_g)], t_g[jnp.argmax(s_g)]
    t_g, s_g, t_p, s_p, p_lm = jax.vmap(one)(yaws)
    best_g = jnp.argmax(s_g)

    # Joint (yaw, translation) plausibility pick: each yaw contributes its
    # best PLAUSIBLE candidate — its global peak if that already lies
    # within the dynamics window, else its windowed peak if that is a
    # genuine local max of the surface (a shoulder of an out-of-window peak
    # is a boundary artifact, not a registration hypothesis — rejecting
    # shoulders is also the corrupted-prediction guard: garbage predictions
    # produce shoulder-only windows and fall back to the global argmax,
    # which re-anchors the trajectory). If the global argmax is
    # implausible — deviating from the constant-velocity prediction by
    # > plaus_gate in one frame (0.4 m at 10 Hz = 40 m/s^2, beyond any
    # road vehicle: necessarily a building-period alias) — and the best
    # plausible candidate holds >= plaus_rel of its score, the plausible
    # candidate wins. Skipped while no velocity exists (first motion frame,
    # standstill), where the global argmax IS the stale-warm-start rescue.
    dev_g = jnp.linalg.norm(t_g[:, :2] - pred_t[None, :2], axis=-1)
    plaus_ok = (dev_g <= plaus_gate) | p_lm
    t_pl = jnp.where((dev_g <= plaus_gate)[:, None], t_g, t_p)
    s_pl = jnp.where(dev_g <= plaus_gate, s_g,
                     jnp.where(p_lm, s_p, -jnp.inf))
    best_p = jnp.argmax(s_pl)
    have_vel = jnp.linalg.norm(pred_t[:2]) > 0.05
    use_plaus = (
        have_vel
        & (dev_g[best_g] > plaus_gate)
        & jnp.any(plaus_ok)
        & (s_pl[best_p] >= plaus_rel * s_g[best_g])
        & jnp.isfinite(s_pl[best_p])
    )
    pick = jnp.where(use_plaus, best_p, best_g)
    t = jnp.where(use_plaus, t_pl[pick], t_g[pick])
    return yaws[pick], t


def _peak(corr: Array, cell: float, window: Array | None = None):
    """Argmax of ``corr`` (optionally restricted to ``window``) with 1-D
    parabolic sub-cell refinement on each axis (~cell/10 accuracy).
    Returns (t [3], score, is_local_max) — the last flag says whether the
    selected cell is a genuine local maximum of the FULL surface (false for
    a windowed argmax sitting on the shoulder of a peak outside the window,
    i.e. a boundary artifact rather than a real registration hypothesis)."""
    n_bins = corr.shape[0]
    c = corr if window is None else jnp.where(window, corr, -jnp.inf)
    flat = jnp.argmax(c)
    si, sj = flat // n_bins, flat % n_bins

    def parab(cm, c0, cp):
        denom = cm - 2.0 * c0 + cp
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    def at(i, j):
        v = corr[i % n_bins, j % n_bins]
        return jnp.where(jnp.isfinite(v), v, corr[si, sj])

    c0 = corr[si, sj]
    nb = jnp.stack([at(si - 1, sj), at(si + 1, sj),
                    at(si, sj - 1), at(si, sj + 1)])
    is_local_max = c0 >= jnp.max(nb)

    off_i = parab(nb[0], c0, nb[1])
    off_j = parab(nb[2], c0, nb[3])

    dx = (jnp.where(si > n_bins // 2, si - n_bins, si) + off_i) * cell
    dy = (jnp.where(sj > n_bins // 2, sj - n_bins, sj) + off_j) * cell
    t = jnp.array([1.0, 0.0, 0.0]) * dx + jnp.array([0.0, 1.0, 0.0]) * dy
    return t, c0, is_local_max


def _correlate(
    curr_xyz, curr_mask, last_xyz, last_mask, cell, half_extent, max_shift,
    ground_z, pred_t=None, plaus_gate=0.0,
):
    """Single-rotation BEV correlation.

    Returns (t_global [3], score_global) when ``pred_t`` is None, else
    (t_global, score_global, t_windowed, score_windowed, windowed_is_local_
    max) — selection between them happens jointly over yaw candidates in
    ``bev_pose_init``."""
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

    t_g, s_g, _ = _peak(corr, cell)
    if pred_t is None or plaus_gate <= 0.0:
        return t_g, s_g

    # plausibility window: cells whose signed displacement lies within
    # plaus_gate of the constant-velocity prediction
    disp = jnp.where(idx > n_bins // 2, idx - n_bins, idx) * cell
    d2 = ((disp[:, None] - pred_t[0]) ** 2
          + (disp[None, :] - pred_t[1]) ** 2)
    window = d2 <= plaus_gate * plaus_gate
    t_p, s_p, p_localmax = _peak(corr, cell, window=window)
    # Empty-window guard: when no finite correlation cell lies inside the
    # dynamics window (pred_t beyond max_shift — e.g. a diverged previous
    # velocity), _peak's argmax over the all--inf surface degenerates to
    # cell (0, 0) carrying the FULL-surface score corr[0, 0]; without this
    # guard that near-zero-shift artifact could pass the plausibility pick.
    nonempty = jnp.any(window & jnp.isfinite(corr))
    return t_g, s_g, t_p, s_p, p_localmax & nonempty & jnp.isfinite(s_p)


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
