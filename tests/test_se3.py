import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssf_slam_tpu.ops import se3


def rand_quat(rng):
    q = rng.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q), dtype=jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng)
    v = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    r = se3.quat_to_matrix(q)
    np.testing.assert_allclose(se3.quat_rotate(q, v), v @ np.asarray(r).T,
                               rtol=1e-5, atol=1e-5)


def test_quat_multiply_composes_rotation(rng):
    q1, q2 = rand_quat(rng), rand_quat(rng)
    v = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    lhs = se3.quat_rotate(se3.quat_multiply(q1, q2), v)
    rhs = se3.quat_rotate(q1, se3.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(20):
        q = rand_quat(rng)
        q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
        # same rotation up to sign
        dot = abs(float(jnp.dot(q, q2)))
        assert dot > 1 - 1e-5


def test_rpy_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, size=3)
    q = se3.quat_from_rpy(*[jnp.float32(a) for a in rpy])
    r2, p2, y2 = se3.quat_to_rpy(q)
    np.testing.assert_allclose([r2, p2, y2], rpy, rtol=1e-4, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([1e-9, 0, 0], dtype=jnp.float32)
    q = se3.so3_exp_quat(w)
    np.testing.assert_allclose(q, [5e-10, 0, 0, 1], atol=1e-7)
    # finite angle: rotation by |w| around w/|w|
    w = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    q = se3.so3_exp_quat(w)
    v = se3.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-5)


def test_pose_compose_inverse(rng):
    pa = (rand_quat(rng), jnp.asarray(rng.normal(size=3), jnp.float32))
    pb = (rand_quat(rng), jnp.asarray(rng.normal(size=3), jnp.float32))
    p = jnp.asarray(rng.normal(size=3), jnp.float32)
    # compose then apply == apply twice
    lhs = se3.pose_apply(se3.pose_compose(pa, pb), p)
    rhs = se3.pose_apply(pa, se3.pose_apply(pb, p))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-5)
    # inverse
    pi = se3.pose_inverse(pa)
    back = se3.pose_apply(pi, se3.pose_apply(pa, p))
    np.testing.assert_allclose(back, p, rtol=1e-4, atol=1e-5)
    # between: T_a * between(a,b) == T_b
    bt = se3.pose_between(pa, pb)
    q_b, t_b = se3.pose_compose(pa, bt)
    np.testing.assert_allclose(t_b, pb[1], atol=1e-5)
    assert abs(float(jnp.dot(q_b, pb[0]))) > 1 - 1e-5


def test_jit_and_vmap(rng):
    qs = jnp.asarray(np.stack([rand_quat(rng) for _ in range(4)]))
    vs = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    out = jax.jit(jax.vmap(se3.quat_rotate))(qs, vs)
    assert out.shape == (4, 3)
