"""IMU preintegration as a TPU-native `lax.scan` program.

Re-design of the reference's VINS-Mono-style midpoint preintegration
(``LiLi-OM/include/factors/Preintegration.h``): the per-sample C++ loop with
15×15 Jacobian/covariance recursions becomes one scanned XLA program, and a
whole sliding window of intervals integrates in parallel under ``vmap``
(fixed max-samples-per-interval + validity mask, as required by static
shapes).

State ordering follows the reference (Preintegration.h:14-20):
``[p(0:3), θ(3:6), v(6:9), ba(9:12), bg(12:15)]``.

Replicated reference behaviors (deliberate, for parity — see SURVEY.md §7
"reference quirks"):

* ``F[0:3,12:15]`` uses a ``-1/6`` factor (Preintegration.h:120) where
  VINS-Mono uses ``-1/4`` — kept as-is.
* ``V[0:3,0:3]`` / ``V[0:3,6:9]`` use ``0.5·R·dt²`` (Preintegration.h:132,134)
  where VINS-Mono uses ``0.25`` — kept as-is.
* Covariance is seeded at ``init_cov·I`` rather than 0
  (Preintegration.h:45; 1e-4 Livox, 1e-3 ROT).
* The per-step quaternion increment uses the exact exponential map instead of
  the unnormalized small-angle quaternion ``[1, ωdt/2]`` (Preintegration.h:90)
  — an O((ωdt)²) refinement; the reference renormalizes each step anyway.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.math import exp_so3, hat, quat_conj, quat_mul, quat_normalize, quat_rotate, quat_to_rotmat

# State-order offsets (Preintegration.h:14-20)
O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


class ImuNoise(NamedTuple):
    """IMU noise densities & gravity.

    Defaults are the Livox variant's hardcoded values
    (Preintegration.h:40-46); the ROT variant loads these from config
    (LiLi-OM-ROT config_fr_iosb.yaml:5-9) with ``init_cov=1e-3``.
    """

    acc_n: float = 0.00059
    gyr_n: float = 0.000061
    acc_w: float = 0.000011
    gyr_w: float = 0.000001
    init_cov: float = 1e-4
    g_norm: float = 9.805

    def g_vec(self, dtype=jnp.float32) -> jnp.ndarray:
        """Gravity vector convention of the reference: -(0,0,g) (Preintegration.h:46)."""
        return jnp.array([0.0, 0.0, -self.g_norm], dtype=dtype)

    def noise_diag(self, dtype=jnp.float32) -> jnp.ndarray:
        """(18,) diagonal of the noise covariance (Preintegration.h:48-54)."""
        return jnp.array(
            [self.acc_n**2] * 3
            + [self.gyr_n**2] * 3
            + [self.acc_n**2] * 3
            + [self.gyr_n**2] * 3
            + [self.acc_w**2] * 3
            + [self.gyr_w**2] * 3,
            dtype=dtype,
        )

    def noise_cov(self, dtype=jnp.float32) -> jnp.ndarray:
        """18×18 diagonal noise covariance (Preintegration.h:48-54)."""
        return jnp.diag(self.noise_diag(dtype))


class Preint(NamedTuple):
    """Preintegrated IMU interval (pytree). Mirrors the members of the
    reference ``Preintegration`` class that downstream factors consume."""

    dp: jnp.ndarray  # (3,) position delta in frame i
    dq: jnp.ndarray  # (4,) orientation delta, wxyz
    dv: jnp.ndarray  # (3,) velocity delta in frame i
    jacobian: jnp.ndarray  # (15,15) d(state)/d(bias & state) chain
    covariance: jnp.ndarray  # (15,15)
    ba: jnp.ndarray  # (3,) linearization-point accel bias
    bg: jnp.ndarray  # (3,) linearization-point gyro bias
    sum_dt: jnp.ndarray  # () total integrated time


def init_preint(ba: jnp.ndarray, bg: jnp.ndarray, noise: ImuNoise, dtype=None) -> Preint:
    dtype = dtype or jnp.asarray(ba).dtype
    ba = jnp.asarray(ba, dtype)
    bg = jnp.asarray(bg, dtype)
    return Preint(
        dp=jnp.zeros(3, dtype),
        dq=jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
        dv=jnp.zeros(3, dtype),
        jacobian=jnp.eye(15, dtype=dtype),
        covariance=noise.init_cov * jnp.eye(15, dtype=dtype),
        ba=ba,
        bg=bg,
        sum_dt=jnp.zeros((), dtype),
    )


def _midpoint_step(p: Preint, acc0, gyr0, acc1, gyr1, dt, noise_diag):
    """One midpoint step: Preintegration.h:79-148 as pure array math.
    ``noise_diag``: (18,) — the noise covariance is diagonal, so
    ``V·Q·Vᵀ = (V∘q)·Vᵀ`` (one 15×18 scale + one matmul, not two matmuls)."""
    dtype = p.dp.dtype
    un_acc_0 = quat_rotate(p.dq, acc0 - p.ba)
    un_gyr = 0.5 * (gyr0 + gyr1) - p.bg
    dq1 = quat_normalize(quat_mul(p.dq, exp_so3(un_gyr * dt)))
    un_acc_1 = quat_rotate(dq1, acc1 - p.ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    dp1 = p.dp + p.dv * dt + 0.5 * un_acc * dt * dt
    dv1 = p.dv + un_acc * dt

    # --- F (15×15) and V (15×18): Preintegration.h:114-143 ---
    R0 = quat_to_rotmat(p.dq)
    R1 = quat_to_rotmat(dq1)
    Rw = hat(un_gyr)
    Ra0 = hat(acc0 - p.ba)
    Ra1 = hat(acc1 - p.ba)
    I3 = jnp.eye(3, dtype=dtype)
    ImRw = I3 - Rw * dt

    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(-0.25 * (R0 @ Ra0) * dt * dt - 0.25 * (R1 @ Ra1 @ ImRw) * dt * dt)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
    # reference quirk: -1/6 factor (Preintegration.h:120)
    F = F.at[0:3, 12:15].set(-0.1667 * (R1 @ Ra1) * dt * dt * (-dt))
    F = F.at[3:6, 3:6].set(ImRw)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(-0.5 * (R0 @ Ra0) * dt - 0.5 * (R1 @ Ra1 @ ImRw) * dt)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(-0.5 * (R1 @ Ra1) * dt * (-dt))
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    V = jnp.zeros((15, 18), dtype)
    # reference quirk: 0.5·R·dt² position-noise mapping (Preintegration.h:132,134)
    V = V.at[0:3, 0:3].set(0.5 * R0 * dt * dt)
    v03 = -0.25 * (R1 @ Ra1) * dt * dt * 0.5 * dt
    V = V.at[0:3, 3:6].set(v03)
    V = V.at[0:3, 6:9].set(0.5 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(v03)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    v63 = -0.5 * (R1 @ Ra1) * dt * 0.5 * dt
    V = V.at[6:9, 3:6].set(v63)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(v63)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)

    jac = F @ p.jacobian
    cov = F @ p.covariance @ F.T + (V * noise_diag[None, :]) @ V.T
    return Preint(dp1, dq1, dv1, jac, cov, p.ba, p.bg, p.sum_dt + dt)


def integrate(
    noise: ImuNoise,
    ba: jnp.ndarray,
    bg: jnp.ndarray,
    acc0: jnp.ndarray,
    gyr0: jnp.ndarray,
    dts: jnp.ndarray,
    accs: jnp.ndarray,
    gyrs: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Preint:
    """Integrate an IMU interval: the scanned equivalent of repeated
    ``push_back`` (Preintegration.h:57-62).

    Args:
      acc0, gyr0: the sample *at* the interval start (reference ctor args).
      dts:  (N,) per-sample dt.
      accs, gyrs: (N,3) samples at each step end.
      mask: (N,) validity; padded (False) steps are exact no-ops. Padding
        must be trailing if samples after padding are to chain correctly.
    """
    dtype = jnp.asarray(accs).dtype
    p0 = init_preint(ba, bg, noise, dtype=dtype)
    ncov = noise.noise_diag(dtype)
    if mask is None:
        mask = jnp.ones(dts.shape, bool)

    def step(carry, inp):
        p, a0, g0 = carry
        dt, a1, g1, valid = inp
        dt = jnp.where(valid, dt, 0.0).astype(dtype)
        p1 = _midpoint_step(p, a0, g0, a1, g1, dt, ncov)
        # masked steps also keep the carried previous sample unchanged
        p1 = jax.tree.map(lambda new, old: jnp.where(valid, new, old), p1, p)
        a0 = jnp.where(valid, a1, a0)
        g0 = jnp.where(valid, g1, g0)
        return (p1, a0, g0), None

    (pf, _, _), _ = jax.lax.scan(step, (p0, jnp.asarray(acc0, dtype), jnp.asarray(gyr0, dtype)), (dts, accs, gyrs, mask))
    return pf


# vmapped form for a whole window of intervals: (W, N, ...) inputs.
integrate_batch = jax.vmap(integrate, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))


# ---------------------------------------------------------------------------
# Log-depth parallel forms. The sequential scans above cost N (=imu_cap)
# dependent 15×15-matmul rounds of pure latency per keyframe; the same
# recursions are associative once the orientation chain is factored out:
#
#   dq_k   = dq_{k-1} ⊗ E_k              — quaternion prefix product
#   jac_k  = F_k · jac_{k-1}             — (A,W) pair composition:
#   cov_k  = F_k cov_{k-1} F_kᵀ + W_k      (A2A1, A2 W1 A2ᵀ + W2)
#   dv/dp  = prefix sums of batched per-step terms
#
# so `associative_scan` runs them in ⌈log₂N⌉ batched rounds. f32 caveat:
# re-association changes round-off (~1e-6 relative vs the scan — tested);
# the per-step quaternion normalization is deferred to the prefix results.
# Both parallel forms require TRAILING padding (mask=False only at the
# tail), which is the documented contract of the sequential forms too.
# ---------------------------------------------------------------------------


def _quat_prefix(E: jnp.ndarray) -> jnp.ndarray:
    """(N,4) per-step unit quats → (N,4) normalized prefix products
    Q_k = E_1 ⊗ … ⊗ E_k via associative_scan."""
    Q = jax.lax.associative_scan(quat_mul, E, axis=0)
    return Q / jnp.linalg.norm(Q, axis=-1, keepdims=True)


def _step_inputs(acc0, gyr0, dts, accs, gyrs, mask, dtype):
    """Shared per-step quantities: masked dt, (a0,g0) previous-sample
    shifts, midpoint gyro."""
    dt = jnp.where(mask, dts, 0.0).astype(dtype)
    a0 = jnp.concatenate([jnp.asarray(acc0, dtype)[None], accs[:-1]], axis=0)
    g0 = jnp.concatenate([jnp.asarray(gyr0, dtype)[None], gyrs[:-1]], axis=0)
    return dt, a0, g0


def propagate_world_parallel(
    t, q, v, ba, bg,
    noise: ImuNoise,
    acc0, gyr0,
    dts, accs, gyrs,
    mask: Optional[jnp.ndarray] = None,
):
    """Log-depth :func:`propagate_world` (same contract, trailing padding)."""
    dtype = jnp.asarray(accs).dtype
    g = noise.g_vec(dtype)
    if mask is None:
        mask = jnp.ones(dts.shape, bool)
    dt, a0, g0 = _step_inputs(acc0, gyr0, dts, accs, gyrs, mask, dtype)

    un_gyr = 0.5 * (g0 + gyrs) - bg
    E = jax.vmap(exp_so3)(un_gyr * dt[:, None])
    Qk = _quat_prefix(E)  # orientation AFTER step k, relative to q
    q_abs = quat_mul(jnp.broadcast_to(q, Qk.shape), Qk)
    q_prev = jnp.concatenate([jnp.asarray(q, dtype)[None], q_abs[:-1]], axis=0)

    un_acc = 0.5 * ((quat_rotate(q_prev, a0 - ba) + g)
                    + (quat_rotate(q_abs, accs - ba) + g))
    dv_steps = un_acc * dt[:, None]
    v_k = jnp.asarray(v, dtype) + jnp.cumsum(dv_steps, axis=0)
    v_prev = jnp.concatenate([jnp.asarray(v, dtype)[None], v_k[:-1]], axis=0)
    dp_steps = v_prev * dt[:, None] + 0.5 * un_acc * dt[:, None] ** 2
    t_f = jnp.asarray(t, dtype) + jnp.sum(dp_steps, axis=0)

    # masked (trailing-pad) steps have dt=0 ⇒ identity E, zero dv/dp terms,
    # so the [-1] entries are already the post-valid-region values; only the
    # carried last sample needs the valid count
    n_valid = jnp.sum(mask.astype(jnp.int32))
    any_valid = n_valid > 0
    last = jnp.maximum(n_valid - 1, 0)
    q_f = quat_normalize(q_abs[-1])
    a_last = jnp.where(any_valid, accs[last], jnp.asarray(acc0, dtype))
    g_last = jnp.where(any_valid, gyrs[last], jnp.asarray(gyr0, dtype))
    return t_f, q_f, v_k[-1], a_last, g_last


def integrate_parallel(
    noise: ImuNoise,
    ba, bg,
    acc0, gyr0,
    dts, accs, gyrs,
    mask: Optional[jnp.ndarray] = None,
) -> Preint:
    """Log-depth :func:`integrate` (same contract, trailing padding)."""
    dtype = jnp.asarray(accs).dtype
    if mask is None:
        mask = jnp.ones(dts.shape, bool)
    dt, a0, g0 = _step_inputs(acc0, gyr0, dts, accs, gyrs, mask, dtype)
    ba = jnp.asarray(ba, dtype)
    bg = jnp.asarray(bg, dtype)

    un_gyr = 0.5 * (g0 + gyrs) - bg
    E = jax.vmap(exp_so3)(un_gyr * dt[:, None])
    dq_k = _quat_prefix(E)  # delta orientation AFTER step k
    qid = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    dq_prev = jnp.concatenate([qid[None], dq_k[:-1]], axis=0)

    un_acc = 0.5 * (quat_rotate(dq_prev, a0 - ba) + quat_rotate(dq_k, accs - ba))
    dv_steps = un_acc * dt[:, None]
    dv_k = jnp.cumsum(dv_steps, axis=0)
    dv_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), dv_k[:-1]], axis=0)
    dp = jnp.sum(dv_prev * dt[:, None] + 0.5 * un_acc * dt[:, None] ** 2, axis=0)

    # batched F/W, then one associative pair-composition scan
    F, W = jax.vmap(
        lambda qp, qk, a0_, a1_, ug, dt_: _step_FW(
            qp, qk, a0_ - ba, a1_ - ba, ug, dt_, noise.noise_diag(dtype))
    )(dq_prev, dq_k, a0, accs, un_gyr, dt)

    def combine(x, y):
        A1, W1 = x
        A2, W2 = y
        return A2 @ A1, A2 @ W1 @ jnp.swapaxes(A2, -1, -2) + W2

    A_all, W_all = jax.lax.associative_scan(combine, (F, W), axis=0)
    Atot, Wtot = A_all[-1], W_all[-1]
    cov = noise.init_cov * (Atot @ Atot.T) + Wtot

    # masked (trailing-pad) steps are exact no-ops (F=I, W=0, E=identity)
    return Preint(
        dp=dp, dq=quat_normalize(dq_k[-1]), dv=dv_k[-1],
        jacobian=Atot, covariance=cov,
        ba=ba, bg=bg, sum_dt=jnp.sum(dt),
    )


def _step_FW(dq_prev, dq_k, da0, da1, un_gyr, dt, noise_diag):
    """Batched-form F (15×15) and W = (V∘q)Vᵀ for one midpoint step —
    identical formulas to :func:`_midpoint_step` (Preintegration.h:114-143)."""
    dtype = dq_prev.dtype
    R0 = quat_to_rotmat(dq_prev)
    R1 = quat_to_rotmat(dq_k)
    Rw = hat(un_gyr)
    Ra0 = hat(da0)
    Ra1 = hat(da1)
    I3 = jnp.eye(3, dtype=dtype)
    ImRw = I3 - Rw * dt

    F = jnp.zeros((15, 15), dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(-0.25 * (R0 @ Ra0) * dt * dt - 0.25 * (R1 @ Ra1 @ ImRw) * dt * dt)
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[0:3, 12:15].set(-0.1667 * (R1 @ Ra1) * dt * dt * (-dt))
    F = F.at[3:6, 3:6].set(ImRw)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(-0.5 * (R0 @ Ra0) * dt - 0.5 * (R1 @ Ra1 @ ImRw) * dt)
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(-0.5 * (R1 @ Ra1) * dt * (-dt))
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    V = jnp.zeros((15, 18), dtype)
    V = V.at[0:3, 0:3].set(0.5 * R0 * dt * dt)
    v03 = -0.25 * (R1 @ Ra1) * dt * dt * 0.5 * dt
    V = V.at[0:3, 3:6].set(v03)
    V = V.at[0:3, 6:9].set(0.5 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(v03)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    v63 = -0.5 * (R1 @ Ra1) * dt * 0.5 * dt
    V = V.at[6:9, 3:6].set(v63)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(v63)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)
    return F, (V * noise_diag[None, :]) @ V.T


def bias_corrected_deltas(p: Preint, bai: jnp.ndarray, bgi: jnp.ndarray):
    """First-order bias correction of (dp, dq, dv) (Preintegration.h:189-202)."""
    dba = bai - p.ba
    dbg = bgi - p.bg
    dp = p.dp + p.jacobian[O_P : O_P + 3, O_BA : O_BA + 3] @ dba + p.jacobian[O_P : O_P + 3, O_BG : O_BG + 3] @ dbg
    dv = p.dv + p.jacobian[O_V : O_V + 3, O_BA : O_BA + 3] @ dba + p.jacobian[O_V : O_V + 3, O_BG : O_BG + 3] @ dbg
    dq = quat_normalize(quat_mul(p.dq, exp_so3(p.jacobian[O_R : O_R + 3, O_BG : O_BG + 3] @ dbg)))
    return dp, dq, dv


def residual(
    p: Preint,
    noise: ImuNoise,
    Pi, Qi, Vi, Bai, Bgi,
    Pj, Qj, Vj, Baj, Bgj,
) -> jnp.ndarray:
    """15-dof preintegration residual (Preintegration.h:175-211).

    Unwhitened; combine with :func:`sqrt_info` for the factor
    (``ImuFactor.h:40-42``).
    """
    g = noise.g_vec(p.dp.dtype)
    dt = p.sum_dt
    dp, dq, dv = bias_corrected_deltas(p, Bai, Bgi)
    Qi_inv = quat_conj(Qi)
    r_p = quat_rotate(Qi_inv, -0.5 * g * dt * dt + Pj - Pi - Vi * dt) - dp
    r_q = 2.0 * quat_normalize(quat_mul(quat_conj(dq), quat_mul(Qi_inv, Qj)))[1:]
    r_v = quat_rotate(Qi_inv, -g * dt + Vj - Vi) - dv
    return jnp.concatenate([r_p, r_q, r_v, Baj - Bai, Bgj - Bgi])


def sqrt_info(p: Preint) -> jnp.ndarray:
    """Whitening matrix W with Wᵀ W = P⁻¹ (via W = L⁻¹, P = L Lᵀ).

    Equivalent to the reference's ``LLT(cov⁻¹).matrixL().transpose()``
    (ImuFactor.h:40-42) up to an orthogonal factor, which leaves the
    least-squares objective identical.
    """
    L = jnp.linalg.cholesky(p.covariance)
    return jax.scipy.linalg.solve_triangular(L, jnp.eye(15, dtype=p.covariance.dtype), lower=True)


def propagate_world(
    t, q, v,
    ba, bg,
    noise: ImuNoise,
    acc0, gyr0,
    dts, accs, gyrs,
    mask: Optional[jnp.ndarray] = None,
):
    """World-frame midpoint IMU state propagation (BackendFusion.cpp:801-827).

    Returns the propagated ``(t, q, v)`` plus the last consumed sample
    ``(acc, gyr)`` so callers can chain intervals.
    """
    dtype = jnp.asarray(accs).dtype
    g = noise.g_vec(dtype)
    if mask is None:
        mask = jnp.ones(dts.shape, bool)

    def step(carry, inp):
        (t, q, v, a0, g0) = carry
        dt, a1, g1, valid = inp
        dt = jnp.where(valid, dt, 0.0).astype(dtype)
        un_acc_0 = quat_rotate(q, a0 - ba) + g
        un_gyr = 0.5 * (g0 + g1) - bg
        q1 = quat_normalize(quat_mul(q, exp_so3(un_gyr * dt)))
        un_acc_1 = quat_rotate(q1, a1 - ba) + g
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        t1 = t + v * dt + 0.5 * un_acc * dt * dt
        v1 = v + un_acc * dt
        q1 = jnp.where(valid, q1, q)
        a0 = jnp.where(valid, a1, a0)
        g0 = jnp.where(valid, g1, g0)
        return (t1, q1, v1, a0, g0), None

    (t, q, v, a0, g0), _ = jax.lax.scan(
        step,
        (jnp.asarray(t, dtype), jnp.asarray(q, dtype), jnp.asarray(v, dtype), jnp.asarray(acc0, dtype), jnp.asarray(gyr0, dtype)),
        (dts, accs, gyrs, mask),
    )
    return t, q, v, a0, g0
