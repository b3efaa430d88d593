"""Schur-complement marginalization checks (MarginalizationFactor.cpp math)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops.marginalization import schur_marginalize


def random_spd(key, n, cond=10.0):
    A = jax.random.normal(key, (n, n))
    return A @ A.T + 0.1 * jnp.eye(n)


class TestSchurMarginalize:
    def test_matches_dense_schur(self):
        """J, r0 must reproduce A = Arr − Arm·Amm⁻¹·Amr and b likewise."""
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        D, m = 20, 8
        H = random_spd(k1, D)
        g = jax.random.normal(k2, (D,))
        J, r0 = schur_marginalize(H, g, m)

        Amm = np.asarray(H[:m, :m])
        Amr = np.asarray(H[:m, m:])
        Arm = np.asarray(H[m:, :m])
        Arr = np.asarray(H[m:, m:])
        gm, gr = np.asarray(g[:m]), np.asarray(g[m:])
        A = Arr - Arm @ np.linalg.inv(Amm) @ Amr
        b = gr - Arm @ np.linalg.inv(Amm) @ gm

        # JᵀJ == A
        np.testing.assert_allclose(np.asarray(J).T @ np.asarray(J), A, rtol=1e-8, atol=1e-8)
        # Jᵀr0 == b
        np.testing.assert_allclose(np.asarray(J).T @ np.asarray(r0), b, rtol=1e-8, atol=1e-8)

    def test_rank_deficient_marginal_block(self):
        """Eigenvalue truncation handles singular Amm (the reference's
        pseudo-inverse path, MarginalizationFactor.cpp:181-190)."""
        key = jax.random.PRNGKey(3)
        D, m = 12, 4
        # Amm rank 2 of 4
        U = jax.random.normal(key, (m, 2))
        H = jnp.zeros((D, D))
        H = H.at[:m, :m].set(U @ U.T)
        H = H.at[m:, m:].set(random_spd(jax.random.PRNGKey(4), D - m))
        g = jax.random.normal(jax.random.PRNGKey(5), (D,))
        J, r0 = schur_marginalize(H, g, m)
        assert np.all(np.isfinite(np.asarray(J)))
        assert np.all(np.isfinite(np.asarray(r0)))
        # with zero coupling Arm, the retained system is untouched
        np.testing.assert_allclose(
            np.asarray(J).T @ np.asarray(J), np.asarray(H[m:, m:]), rtol=1e-8, atol=1e-8
        )

    def test_gaussian_marginalization_equivalence(self):
        """Minimizing ‖r0 + J·x_r‖² must equal min over x_m of the joint
        quadratic — the defining property of marginalization."""
        key = jax.random.PRNGKey(7)
        D, m = 10, 3
        H = random_spd(key, D)
        g = jax.random.normal(jax.random.PRNGKey(8), (D,))
        J, r0 = schur_marginalize(H, g, m)

        # joint minimizer
        x_star = np.linalg.solve(np.asarray(H), -np.asarray(g))
        # prior-only minimizer of the retained block
        xr_star = np.linalg.lstsq(np.asarray(J), -np.asarray(r0), rcond=None)[0]
        np.testing.assert_allclose(xr_star, x_star[m:], rtol=1e-6, atol=1e-8)
