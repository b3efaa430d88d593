"""Closed-form 3×3 symmetric eigendecomposition vs LAPACK eigh."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops.fitting import eig3_symmetric, solve3


class TestEig3:
    def test_matches_eigh_random(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (512, 3, 3))
        A = A @ jnp.swapaxes(A, -1, -2)
        evals, evecs = eig3_symmetric(A)
        ref_vals, _ = jnp.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(evals), np.asarray(ref_vals),
                                   rtol=1e-6, atol=1e-8)
        # eigen equation A v = λ v per column
        for i in range(3):
            Av = jnp.einsum("bij,bj->bi", A, evecs[..., i])
            lv = evals[..., i:i + 1] * evecs[..., i]
            np.testing.assert_allclose(np.asarray(Av), np.asarray(lv),
                                       atol=1e-5)

    def test_orthonormal_columns(self):
        key = jax.random.PRNGKey(1)
        A = jax.random.normal(key, (256, 3, 3))
        A = A @ jnp.swapaxes(A, -1, -2)
        _, V = eig3_symmetric(A)
        VtV = jnp.einsum("bij,bik->bjk", V, V)
        np.testing.assert_allclose(np.asarray(VtV),
                                   np.broadcast_to(np.eye(3), (256, 3, 3)),
                                   atol=1e-6)

    def test_degenerate_planar(self):
        # rank-2 covariance (planar point set): λ0 = 0, evec0 = plane normal
        u = jnp.array([1.0, 0, 0])
        v = jnp.array([0.0, 1, 0])
        A = 4.0 * jnp.outer(u, u) + 2.0 * jnp.outer(v, v)
        evals, evecs = eig3_symmetric(A[None])
        np.testing.assert_allclose(np.asarray(evals[0]), [0.0, 2.0, 4.0], atol=1e-6)
        assert abs(float(evecs[0, 2, 0])) > 0.999  # normal = ±z

    def test_isotropic(self):
        A = 3.0 * jnp.eye(3)
        evals, evecs = eig3_symmetric(A[None])
        np.testing.assert_allclose(np.asarray(evals[0]), [3.0, 3.0, 3.0], atol=1e-6)
        VtV = evecs[0].T @ evecs[0]
        np.testing.assert_allclose(np.asarray(VtV), np.eye(3), atol=1e-6)


class TestSolve3:
    def test_matches_linalg_solve(self):
        key = jax.random.PRNGKey(2)
        A = jax.random.normal(key, (128, 3, 3))
        A = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(3)
        b = jax.random.normal(jax.random.PRNGKey(3), (128, 3))
        x = solve3(A, b)
        ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-8, atol=1e-10)
