"""Point-axis sharding: kNN + grouping over a cloud sharded across chips.

The SURVEY §2.5 stretch axis: the reference has no tensor/sequence
parallelism, but the analogous scaling axis here is the POINT count N — the
cost volumes are O(N*k) with an O(N*M) neighbor search, so scaling N beyond
one chip's HBM/FLOPs means sharding points across the mesh.

Design (mirrors the single-chip Morton-banded engine, ops/banded.py):

1. Both clouds are Morton-sorted under a shared box (host side), then cut
   into D CONTIGUOUS shards — so shard d's queries have their true
   neighbors overwhelmingly in target shard d, spilling into d±1 near the
   cut points.
2. Each device assembles an extended local target
   ``[left-neighbor tail halo || local shard || right-neighbor head halo]``
   with two ``jax.lax.ppermute`` rotations over ICI — the halo exchange.
   No all-gather: per-device target memory is M/D + 2*halo, constant in D.
3. The local kNN+group runs against the extended target (the exact/XLA
   engine here for portability; the banded Pallas kernel drops in on real
   TPU meshes since each local problem is exactly its single-chip shape).
4. Results return in global Morton order; indices are translated back to
   global target rows.

Approximation contract: neighbors further than one shard boundary + halo
away are missed — same flavor as the banded engine's 3-block window, and
measured the same way (recall vs brute force, tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssf_slam_tpu.ops.grouping import group_points
from ssf_slam_tpu.ops.knn import knn as xla_knn
from ssf_slam_tpu.ops.neighbors import cloud_box, morton_sort

Array = jax.Array


def pointsharded_knn_group(
    query: Array,  # [N, 3]
    points: Array,  # [M, 3]
    feats: Array,  # [M, C]
    k: int,
    mesh: Mesh,
    halo: int = 512,
    backend: str = "xla",
    extent: float = 64.0,
) -> tuple[Array, Array, Array]:
    """kNN + feature grouping with the point axis sharded over ``mesh``.

    Returns (sqdist [N, k], idx [N, k] into the MORTON-SORTED target order,
    grouped [N, k, C]) — all in the caller's original query order.
    N and M must divide the mesh size.

    ``backend="banded"`` runs the single-chip Morton-banded Pallas engine
    (ops/banded.py) INSIDE each shard — each device's extended local target
    is already Morton-sorted under the shared global box (interior halos
    are Morton-contiguous; edge devices' wrapped halos are pushed past the
    box by the validity mask, landing in the last band where their 1e6
    coordinates lose every top-k). On a real TPU slice this makes the
    per-device search the exact kernel the single-chip engine ships;
    recall-tested against the same oracle in tests/test_parallel.py
    (interpret mode on the virtual mesh).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = points.shape[0]
    shard_m = m // n_dev
    assert query.shape[0] % n_dev == 0 and m % n_dev == 0
    assert halo <= shard_m, "halo larger than a target shard"

    # host-side Morton preparation (shared box, like the single-chip stem)
    box = cloud_box(query, points)  # ([3], scalar) for unbatched clouds
    q_sorted, q_perm = morton_sort(query, box=box)
    t_sorted, t_perm = morton_sort(points, box=box)
    f_sorted = feats[t_perm]

    sharding = NamedSharding(mesh, P(axis))
    q_sh = jax.device_put(q_sorted, sharding)
    t_sh = jax.device_put(t_sorted, sharding)
    f_sh = jax.device_put(f_sorted, sharding)

    from jax import shard_map

    @jax.jit
    def run(q, t, f):
        def per_device(q_loc, t_loc, f_loc):
            # halo exchange over ICI: left neighbor's tail, right's head
            right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            tail = jax.lax.ppermute(t_loc[-halo:], axis, right)
            head = jax.lax.ppermute(t_loc[:halo], axis, left)
            f_tail = jax.lax.ppermute(f_loc[-halo:], axis, right)
            f_head = jax.lax.ppermute(f_loc[:halo], axis, left)
            t_ext = jnp.concatenate([tail, t_loc, head], axis=0)
            f_ext = jnp.concatenate([f_tail, f_loc, f_head], axis=0)
            # shard-edge devices: the wrapped halo rows are spatially bogus
            # (device 0's "left neighbor" is device D-1); mask them out.
            # DIRECTION MATTERS: the banded planner requires the target's
            # Morton codes ascending, and morton_codes CLAMPS out-of-box
            # coords — so front-bogus rows must go to -1e6 (code 0, still
            # ascending) and back-bogus to +1e6 (max code). Masking both
            # flanks to +1e6 put MAX codes at the FRONT of edge devices'
            # targets, displacing every band by the 2 halo blocks (recall
            # 0.097 on the n_dev=1 chip smoke, where BOTH flanks wrap; on
            # the 8-device CPU mesh only device 0 suffered, which the
            # aggregate recall threshold hid). Euclidean distance excludes
            # both flavors from any top-k regardless of sign.
            didx = jax.lax.axis_index(axis)
            rows = jnp.arange(t_ext.shape[0])
            front_bogus = (didx == 0) & (rows < halo)
            back_bogus = (didx == n_dev - 1) & (rows >= halo + shard_m)
            big = jnp.where(front_bogus[:, None], -1e6,
                            jnp.where(back_bogus[:, None], 1e6, t_ext))
            if backend == "banded":
                from ssf_slam_tpu.ops.neighbors import nn_knn_group

                idx_loc, grouped, _, _ = nn_knn_group(
                    q_loc, big, f_ext, k, backend="banded", extent=extent,
                    box=box)
                d = jnp.sum((q_loc[:, None, :] - big[idx_loc]) ** 2, -1)
            else:
                d, idx_loc = xla_knn(q_loc, big, k, approx=False)
                grouped = group_points(f_ext, idx_loc)
            # local -> global sorted-target row index
            idx_glob = idx_loc - halo + didx * shard_m
            idx_glob = jnp.clip(idx_glob, 0, m - 1)
            return d, idx_glob.astype(jnp.int32), grouped

        # check_vma=False: the banded pallas_call inside does not declare
        # varying-mesh-axis metadata on its out ShapeDtypeStructs, which
        # strict vma checking rejects on compiled (non-interpret) paths
        # (same setting as parallel/mesh.py)
        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )(q, t, f)

    d, idx, grouped = run(q_sh, t_sh, f_sh)
    # back to the caller's query order
    inv = jnp.argsort(q_perm)
    return d[inv], idx[inv], grouped[inv]


def pointshard_reference(query, points, feats, k):
    """Single-device oracle in the same index space (sorted target order)."""
    box = cloud_box(query, points)
    t_sorted, t_perm = morton_sort(points, box=box)
    d, idx = xla_knn(query, t_sorted, k, approx=False)
    return d, idx, group_points(feats[t_perm], idx)
