"""Dense vs pruned Pallas kNN on the real chip, at the production sizes and
with scan-like geometry (points on room surfaces — pruning efficiency is a
property of the data's spatial compactness, so random uniform clouds
understate it). Usage: python examples/profile_knn_prune.py [reps]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def timeit(name, fn, *args, reps=REPS):
    out = fn(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {1e3 * dt:7.2f} ms", flush=True)
    return out


def scan_like(n, seed, extent=40.0):
    """Points on the walls/floor of a room-ish box (surface-concentrated)."""
    r = np.random.default_rng(seed)
    wall = r.integers(0, 5, n)
    u = r.uniform(-extent / 2, extent / 2, (n, 2))
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.where(wall == 0, extent / 2, np.where(wall == 1, -extent / 2, u[:, 0]))
    pts[:, 1] = np.where(wall == 2, extent / 2, np.where(wall == 3, -extent / 2, u[:, 1]))
    z = r.uniform(0, 4.0, n)
    pts[:, 2] = np.where(wall == 4, 0.0, z)
    pts += r.normal(0, 0.02, (n, 3))
    return jnp.asarray(pts, jnp.float32)


def main():
    from lili_om_tpu.ops.knn import knn
    from lili_om_tpu.ops.knn_pallas import knn_pallas, knn_pallas_pruned

    for (Q, P, tag) in [(4096, 32768, "odo"), (6144, 32768, "fus_surf"),
                        (3072, 8192, "fus_edge")]:
        q = scan_like(Q, 1)
        p = scan_like(P, 2)
        mask = jnp.ones((P,), bool).at[-P // 10:].set(False)
        d0, i0 = knn(q, p, k=5, p_mask=mask)
        d1, i1 = timeit(f"{tag} {Q}x{P} dense", knn_pallas, q, p, 5, mask)
        d2, i2 = timeit(f"{tag} {Q}x{P} pruned t2048",
                        lambda a, b, m: knn_pallas_pruned(a, b, 5, m), q, p, mask)
        d3, i3 = timeit(f"{tag} {Q}x{P} pruned t1024",
                        lambda a, b, m: knn_pallas_pruned(a, b, 5, m, tile_p=1024),
                        q, p, mask)
        d4, i4 = timeit(f"{tag} {Q}x{P} pruned t4096",
                        lambda a, b, m: knn_pallas_pruned(a, b, 5, m, tile_p=4096),
                        q, p, mask)
        for nm, d, i in [("t2048", d2, i2), ("t1024", d3, i3), ("t4096", d4, i4)]:
            de = float(jnp.max(jnp.abs(d - d1)))
            im = int(jnp.sum(i != i1))
            print(f"   {nm}: maxerr(d)={de:.2e}  idx mismatches={im}")
        de0 = float(jnp.max(jnp.abs(d1 - d0)))
        print(f"   dense vs XLA ref: maxerr(d)={de0:.2e}")


if __name__ == "__main__":
    main()
