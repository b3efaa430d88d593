"""Unit tests for quaternion/SO(3)/SE(3) math vs closed forms & autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.utils import math as m


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return m.quat_normalize(q)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_quat_mul_identity(key):
    q = random_quats(key, 16)
    qid = m.quat_identity((16,))
    np.testing.assert_allclose(m.quat_mul(q, qid), q, atol=1e-12)
    np.testing.assert_allclose(m.quat_mul(qid, q), q, atol=1e-12)


def test_quat_mul_inverse(key):
    q = random_quats(key, 16)
    qq = m.quat_mul(q, m.quat_conj(q))
    np.testing.assert_allclose(qq, np.tile([1, 0, 0, 0], (16, 1)), atol=1e-12)


def test_quat_rotate_matches_rotmat(key):
    k1, k2 = jax.random.split(key)
    q = random_quats(k1, 32)
    v = jax.random.normal(k2, (32, 3))
    R = m.quat_to_rotmat(q)
    np.testing.assert_allclose(m.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-12)


def test_rotmat_quat_roundtrip(key):
    q = m.unify_quaternion(random_quats(key, 64))
    q2 = m.rotmat_to_quat(m.quat_to_rotmat(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)
    # near-edge cases: 180-degree rotations about each axis
    for axis in range(3):
        th = np.zeros(3)
        th[axis] = np.pi - 1e-8
        q_edge = m.exp_so3(jnp.asarray(th))
        R = m.quat_to_rotmat(q_edge)
        np.testing.assert_allclose(
            m.quat_to_rotmat(m.rotmat_to_quat(R)), R, atol=1e-7
        )


def test_exp_log_roundtrip(key):
    # sample within the injectivity radius ‖θ‖ < π
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    theta = dirs * jax.random.uniform(k2, (64, 1), minval=0.0, maxval=3.1)
    np.testing.assert_allclose(m.log_so3(m.exp_so3(theta)), theta, atol=1e-8)
    # tiny angles (Taylor branch)
    tiny = jax.random.normal(key, (8, 3)) * 1e-8
    np.testing.assert_allclose(m.log_so3(m.exp_so3(tiny)), tiny, atol=1e-14)


def test_exp_so3_matches_deltaQ_small_angle():
    # deltaQ(theta) = [1, theta/2] for small angles (math_tools.h:125-138)
    theta = jnp.array([1e-4, -2e-4, 3e-4])
    q = m.exp_so3(theta)
    np.testing.assert_allclose(q[1:], theta / 2, rtol=1e-6)
    np.testing.assert_allclose(q[0], 1.0, atol=1e-8)


def test_left_right_matrices(key):
    k1, k2 = jax.random.split(key)
    q = random_quats(k1, 8)
    p = random_quats(k2, 8)
    prod = m.quat_mul(q, p)
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", m.quat_left_matrix(q), p), prod, atol=1e-12)
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", m.quat_right_matrix(p), q), prod, atol=1e-12)


def test_right_jacobian_definition(key):
    """Exp(θ+δ) ≈ Exp(θ) ⊗ Exp(Jr(θ)·δ) to first order."""
    theta = jax.random.normal(key, (3,)) * 0.8
    Jr = m.so3_right_jacobian(theta)
    J_auto = jax.jacfwd(lambda d: m.log_so3(m.quat_mul(m.quat_conj(m.exp_so3(theta)), m.exp_so3(theta + d))))(
        jnp.zeros(3)
    )
    np.testing.assert_allclose(Jr, J_auto, atol=1e-8)
    np.testing.assert_allclose(m.so3_right_jacobian_inv(theta) @ Jr, jnp.eye(3), atol=1e-8)


def test_slerp_endpoints_and_midpoint(key):
    k1, k2 = jax.random.split(key)
    q0, q1 = random_quats(k1, 4), random_quats(k2, 4)
    np.testing.assert_allclose(m.quat_slerp(q0, q1, jnp.zeros(4)), q0, atol=1e-9)
    np.testing.assert_allclose(
        jnp.abs(jnp.sum(m.quat_slerp(q0, q1, jnp.ones(4)) * q1, axis=-1)), jnp.ones(4), atol=1e-9
    )
    # midpoint of identity→rot(θ) is rot(θ/2)
    th = jnp.array([0.3, -0.2, 0.5])
    mid = m.quat_slerp(m.QUAT_ID, m.exp_so3(th), jnp.array(0.5))
    np.testing.assert_allclose(m.log_so3(mid), th / 2, atol=1e-9)
    # nearly-parallel branch
    near = m.quat_slerp(q0, q0 * (1 + 1e-12), jnp.full((4,), 0.7))
    np.testing.assert_allclose(near, q0, atol=1e-6)


def test_pose_compose_inverse(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t1, q1 = jax.random.normal(k1, (3,)), m.quat_normalize(jax.random.normal(k2, (4,)))
    t2, q2 = jax.random.normal(k3, (3,)), m.quat_normalize(jax.random.normal(k4, (4,)))
    tc, qc = m.pose_compose(t1, q1, t2, q2)
    tr, qr = m.pose_relative(t1, q1, tc, qc)
    np.testing.assert_allclose(tr, t2, atol=1e-10)
    np.testing.assert_allclose(jnp.abs(jnp.sum(qr * q2)), 1.0, atol=1e-10)
    ti, qi = m.pose_inverse(t1, q1)
    t0, q0 = m.pose_compose(t1, q1, ti, qi)
    np.testing.assert_allclose(t0, jnp.zeros(3), atol=1e-10)


def test_pose_retract_matches_manifold(key):
    t = jnp.array([1.0, 2.0, 3.0])
    q = m.quat_normalize(jax.random.normal(key, (4,)))
    delta = jnp.array([0.1, -0.2, 0.3, 0.01, 0.02, -0.03])
    t2, q2 = m.pose_retract(t, q, delta)
    np.testing.assert_allclose(t2, t + delta[:3], atol=1e-12)
    np.testing.assert_allclose(m.log_so3(m.quat_mul(m.quat_conj(q), q2)), delta[3:], atol=1e-9)


def test_transform_points(key):
    k1, k2 = jax.random.split(key)
    q = m.quat_normalize(jax.random.normal(k1, (4,)))
    t = jnp.array([1.0, -1.0, 0.5])
    pts = jax.random.normal(k2, (100, 3))
    out = m.transform_points(t, q, pts)
    R = m.quat_to_rotmat(q)
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-12)


def test_solve_psd(key):
    A0 = jax.random.normal(key, (9, 9))
    A = A0 @ A0.T + 9 * jnp.eye(9)
    b = jnp.arange(9.0)
    x = m.solve_psd(A, b)
    np.testing.assert_allclose(A @ x, b, atol=1e-9)


def test_hat(key):
    v = jax.random.normal(key, (5, 3))
    w = jax.random.normal(jax.random.split(key)[0], (5, 3))
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", m.hat(v), w), jnp.cross(v, w), atol=1e-12)
