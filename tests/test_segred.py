"""Pallas sorted-segment reduction vs jax.ops.segment_sum (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops.segred_pallas import segment_sum_sorted_pallas


def _ref(pay, sid, M):
    out = np.zeros((M, pay.shape[1]), np.float32)
    for i in range(len(sid)):
        if sid[i] < M:
            out[sid[i]] += pay[i]
    return out


class TestSegredPallas:
    def test_matches_segment_sum(self):
        rng = np.random.default_rng(0)
        N, C, M = 5000, 7, 1200
        sid = np.minimum(np.cumsum(rng.random(N) < 0.3), M).astype(np.int32)
        pay = rng.normal(size=(N, C)).astype(np.float32)
        out = segment_sum_sorted_pallas(jnp.asarray(pay), jnp.asarray(sid), M,
                                        block=512, interpret=True)
        np.testing.assert_allclose(np.asarray(out), _ref(pay, sid, M),
                                   atol=1e-5)

    def test_overflow_rows_dropped(self):
        N, C, M = 2000, 3, 700
        sid = np.full(N, M, np.int32)
        sid[:100] = 0
        pay = np.ones((N, C), np.float32)
        out = segment_sum_sorted_pallas(jnp.asarray(pay), jnp.asarray(sid), M,
                                        block=512, interpret=True)
        out = np.asarray(out)
        assert np.allclose(out[0], 100.0)
        assert np.allclose(out[1:], 0.0)

    def test_every_row_own_segment(self):
        # worst case for the window: ids step by 1 every row
        N, C, M = 1500, 4, 1600
        sid = np.arange(N, dtype=np.int32)
        pay = np.arange(N * C, dtype=np.float32).reshape(N, C)
        out = segment_sum_sorted_pallas(jnp.asarray(pay), jnp.asarray(sid), M,
                                        block=512, interpret=True)
        np.testing.assert_allclose(np.asarray(out)[:N], pay, atol=0)
