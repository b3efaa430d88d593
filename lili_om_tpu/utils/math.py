"""Quaternion / SO(3) / SE(3) primitives for the TPU-native LiLi-OM engine.

Conventions
-----------
* Quaternions are ``[w, x, y, z]`` (Hamilton, scalar-first), matching Eigen's
  internal storage order used throughout the reference
  (``LiLi-OM/include/utils/math_tools.h``).
* Rotations act actively: ``rotate(q, v) = q ⊗ [0, v] ⊗ q⁻¹``.
* Pose tangent space is 6-dof ``[δt (3), δθ (3)]`` with a *right* (body-frame)
  retraction ``q ⊞ δθ = q ⊗ Exp(δθ)``, mirroring the quaternion local
  parameterization (local size 3) of the reference
  (``LiLi-OM/src/MarginalizationFactor.cpp:124-126``).

All functions are pure ``jax.numpy``, shape-polymorphic over leading batch
dimensions where noted, and safe under ``jit``/``vmap``/``grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Basic linear algebra helpers
# ---------------------------------------------------------------------------


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``v`` (batched over leading dims).

    Mirrors ``hat``/``skewSymmetric`` (math_tools.h:15-33).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


skew = hat

# ---------------------------------------------------------------------------
# Quaternion algebra
# ---------------------------------------------------------------------------

QUAT_ID = jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_identity(batch_shape=()) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q1 ⊗ q2`` (scalar-first, batched)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


quat_inv = quat_conj  # unit quaternions only


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q`` without building R.

    Uses the 2-cross-product formula: v' = v + 2 w (u×v) + 2 u×(u×v).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → 3×3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → unit quaternion (w ≥ 0), batched, branch-free.

    Uses the 4-candidate construction (each candidate safe in a different
    trace regime) and selects the numerically best one — no data-dependent
    control flow, so it jits/vmaps cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    # Pick the candidate with the largest pivot.
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return unify_quaternion(quat_normalize(q))


def unify_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize sign so w ≥ 0 (math_tools.h:165-173)."""
    sign = jnp.where(q[..., :1] >= 0.0, 1.0, -1.0)
    return q * sign


def quat_left_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """4×4 matrix L(q) with L(q)·p = q ⊗ p (``Qleft``, math_tools.h:35-42)."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    left = v[..., :, None]
    block = w[..., None, None] * jnp.eye(3, dtype=q.dtype) + hat(v)
    bottom = jnp.concatenate([left, block], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """4×4 matrix R(p) with R(p)·q = q ⊗ p (``Qright``, math_tools.h:44-51)."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    left = v[..., :, None]
    block = w[..., None, None] * jnp.eye(3, dtype=q.dtype) - hat(v)
    bottom = jnp.concatenate([left, block], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# SO(3) exponential / logarithm
# ---------------------------------------------------------------------------


def exp_so3(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector → unit quaternion, Taylor-safe near 0.

    Generalizes ``deltaQ`` (math_tools.h:125-138) to all angles.
    """
    angle2 = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    half = 0.5 * angle
    small = angle2 < 1e-12
    # sin(half)/angle with Taylor fallback 0.5 - angle²/48
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


delta_q = exp_so3  # reference name


def log_so3(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → rotation vector, Taylor-safe near identity."""
    q = unify_quaternion(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm2 = jnp.sum(v * v, axis=-1, keepdims=True)
    vnorm = jnp.sqrt(jnp.maximum(vnorm2, 1e-24))
    small = vnorm2 < 1e-12
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # angle/vnorm with Taylor fallback 2/w · (1 − vnorm²/(3w²))
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-6) * (1.0 - vnorm2 / (3.0 * jnp.maximum(w * w, 1e-12))), angle / vnorm)
    return k * v


def so3_right_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr of SO(3): Exp(θ+δ) ≈ Exp(θ) Exp(Jr δ)."""
    angle2 = jnp.sum(theta * theta, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    small = angle2 < 1e-12
    K = hat(theta)
    K2 = K @ K
    a = jnp.where(small, 0.5 - angle2 / 24.0, (1.0 - jnp.cos(angle)) / jnp.maximum(angle2, 1e-24))
    b = jnp.where(
        small, 1.0 / 6.0 - angle2 / 120.0, (angle - jnp.sin(angle)) / jnp.maximum(angle2 * angle, 1e-24)
    )
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye - a[..., None, None] * K + b[..., None, None] * K2


def so3_right_jacobian_inv(theta: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3)."""
    angle2 = jnp.sum(theta * theta, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    small = angle2 < 1e-12
    K = hat(theta)
    K2 = K @ K
    half = 0.5 * angle
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + angle2 / 720.0,
        (1.0 / jnp.maximum(angle2, 1e-24)) - (1.0 + jnp.cos(angle)) / jnp.maximum(2.0 * angle * jnp.sin(angle), 1e-24),
    )
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + 0.5 * K + cot_term[..., None, None] * K2


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (batched).

    Replaces the per-point ``Eigen::Quaterniond::slerp`` undistortion
    (LiLi-OM/src/Preprocessing.cpp:104-127). Branch-free (lerp fallback when
    the quaternions are nearly parallel).
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    omega = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-9))
    so = jnp.sin(omega)
    near = dot > 1.0 - 1e-7
    t = t[..., None] if t.ndim == q0.ndim - 1 else t
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * omega) / jnp.maximum(so, 1e-12))
    w1 = jnp.where(near, t, jnp.sin(t * omega) / jnp.maximum(so, 1e-12))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# SE(3) pose helpers — pose is the pair (t[...,3], q[...,4])
# ---------------------------------------------------------------------------


def pose_retract(t: jnp.ndarray, q: jnp.ndarray, delta: jnp.ndarray):
    """Right-retraction of a 6-dof tangent [δt, δθ] onto (t, q)."""
    dt, dth = delta[..., :3], delta[..., 3:6]
    return t + dt, quat_normalize(quat_mul(q, exp_so3(dth)))


def pose_compose(t1, q1, t2, q2):
    """(t1,q1) ∘ (t2,q2) — apply pose2 then pose1."""
    return t1 + quat_rotate(q1, t2), quat_normalize(quat_mul(q1, q2))


def pose_inverse(t, q):
    qi = quat_conj(q)
    return -quat_rotate(qi, t), qi


def pose_relative(t1, q1, t2, q2):
    """Pose of frame-2 expressed in frame-1: (t1,q1)⁻¹ ∘ (t2,q2)."""
    qi = quat_conj(q1)
    return quat_rotate(qi, t2 - t1), quat_normalize(quat_mul(qi, q2))


def transform_points(t, q, pts):
    """Apply pose to a point cloud: q·p + t. Broadcasts over points."""
    return quat_rotate(q[..., None, :], pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# Misc numeric helpers
# ---------------------------------------------------------------------------


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve A x = b for symmetric PSD A via Cholesky with optional damping."""
    n = A.shape[-1]
    A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T if L.ndim == 2 else jnp.swapaxes(L, -1, -2), y, lower=False)


# ---------------------------------------------------------------------------
# numpy twins for HOST paths (loop-closure correction, evaluation, IO): the
# jnp versions above round-trip every call through the device — on a
# remote-attached runtime each eager op is an RPC, so per-frame host loops
# over them cost ~30 ms/op (measured: the dense-trajectory re-chain made
# each loop-closure correction take ~25 s).
# ---------------------------------------------------------------------------


def quat_mul_np(q1, q2):
    """Batched Hamilton product, numpy, (...,4) wxyz."""
    import numpy as np

    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj_np(q):
    import numpy as np

    return q * np.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize_np(q):
    import numpy as np

    return q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_rotate_np(q, v):
    """Rotate (...,3) vectors by (...,4) quats, numpy."""
    import numpy as np

    w = q[..., :1]
    u = q[..., 1:]
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)
