"""Matmul precision policy.

TPU MXU matmuls default to bfloat16 passes, which is right for the neural
network but catastrophically wrong for geometry: a 3x3 rotation composed at
bf16 carries ~1e-3 relative error, which at a 30 m scene scale is centimeters
of registration error per frame (measured 0.21 m residual on a clean Kabsch
fit on TPU v5e before this policy).

Rule: every einsum/dot on the GEOMETRY path (SE3, Kabsch, Gauss-Newton,
pose graph, distance expansions) uses ``GEOM`` precision; the scene-flow
network's big feature matmuls keep the fast default.
"""

import jax

GEOM = jax.lax.Precision.HIGHEST
