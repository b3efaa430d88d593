"""Microbench of the primitives under voxel_downsample on the live backend:
argsort, sorted-segment-sum, scatter-add/max, gathers — to decide whether a
sort-free (hash-claim) downsample is worth building."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:42s} {1e3 * (time.perf_counter() - t0) / REPS:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for N in (102_400, 163_840):
        keys = jnp.asarray(rng.integers(0, 2**30, N).astype(np.int32))
        pts = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
        M = 32768
        seg_sorted = jnp.sort(jnp.asarray(rng.integers(0, M, N).astype(np.int32)))
        seg_unsorted = jnp.asarray(rng.integers(0, 4 * M, N).astype(np.int32))

        timeit(f"argsort i32 N={N}", jax.jit(jnp.argsort), keys)
        timeit(f"sort i32 N={N} (no index)", jax.jit(jnp.sort), keys)
        order = jnp.argsort(keys)
        timeit(f"gather (N,3)+key N={N}",
               jax.jit(lambda o, p, k: (p[o], k[o])), order, pts, keys)
        timeit(f"segsum sorted N={N}->M={M}",
               jax.jit(lambda s, p: jax.ops.segment_sum(
                   p, s, num_segments=M, indices_are_sorted=True)),
               seg_sorted, pts)
        timeit(f"segsum unsorted N={N}->M={4*M}",
               jax.jit(lambda s, p: jax.ops.segment_sum(
                   p, s, num_segments=4 * M)),
               seg_unsorted, pts)
        timeit(f"scatter-max N={N}->M={4*M}",
               jax.jit(lambda s, k: jnp.zeros(4 * M, jnp.int32).at[s].max(k)),
               seg_unsorted, keys)
        timeit(f"cumsum M={4*M}",
               jax.jit(jnp.cumsum), jnp.ones(4 * M, jnp.int32))

    # Pallas kNN block-size sweep (TPU only)
    if jax.default_backend() == "tpu":
        from lili_om_tpu.ops.knn_pallas import knn_pallas
        q = jnp.asarray(rng.uniform(-50, 50, (6144, 3)).astype(np.float32))
        p = jnp.asarray(rng.uniform(-50, 50, (32768, 3)).astype(np.float32))
        for qb, tp in ((256, 2048), (256, 4096), (512, 2048), (512, 4096),
                       (1024, 2048), (128, 8192)):
            try:
                timeit(f"knn_pallas 6144x32768 qb={qb} tp={tp}",
                       lambda qq, pp, qb=qb, tp=tp: knn_pallas(
                           qq, pp, k=5, q_block=qb, tile_p=tp), q, p)
            except Exception as e:  # VMEM OOM etc.
                print(f"knn_pallas qb={qb} tp={tp}: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
