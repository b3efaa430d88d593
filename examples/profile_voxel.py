"""Microbenchmark of the voxel-downsample variants on the attached device —
the three hot shapes of the parity pipeline (feature ring-ds, odometry map
union vs incremental table merge, fusion surf map build).

Timing through the remote tunnel: amortized difference of two loop lengths
with one np.asarray sync each (block_until_ready is a no-op; see CLAUDE.md).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from lili_om_tpu.ops.voxel import (merge_voxel_entries, voxel_downsample,
                                   voxel_downsample_ordered)


def timed(fn, *args, n1=6, n2=26):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + sync

    def loop(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    d1, d2 = loop(n1), loop(n2)
    return (d2 - d1) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(0)
    R, C = 64, 1800
    # organized wavy-wall sweep (feature-ds shape)
    az = np.linspace(-np.pi, np.pi, C)
    img = np.zeros((R, C, 3), np.float32)
    for r in range(R):
        rad = 12 + 4 * np.sin(3 * az + 0.2 * r)
        img[r] = np.stack([rad * np.cos(az), rad * np.sin(az),
                           np.full(C, 0.12 * r)], 1)
    flat = jnp.asarray(img.reshape(-1, 3))
    fmask = jnp.asarray(rng.random(R * C) > 0.15)
    rings = jnp.asarray(np.repeat(np.arange(R, dtype=np.int32), C))

    print(f"backend={jax.default_backend()}")
    t = timed(lambda: voxel_downsample(flat, fmask, 0.6, 8192, groups=rings))
    print(f"feature ring-ds 115k  exact single-sort : {t:7.2f} ms")
    t = timed(lambda: voxel_downsample_ordered(flat, fmask, 0.6, 8192, groups=rings))
    print(f"feature ring-ds 115k  ordered two-stage : {t:7.2f} ms")

    # odometry map-union shape: 20 frames x 4096
    union = jnp.asarray(rng.uniform(-40, 40, (81920, 3)).astype(np.float32))
    umask = jnp.asarray(rng.random(81920) > 0.2)
    t = timed(lambda: voxel_downsample(union, umask, 0.4, 32768))
    print(f"odometry union 82k    exact single-sort : {t:7.2f} ms")

    T = 32768 + 8192
    cells = jnp.asarray(rng.integers(-500, 500, (T + 8192, 3)).astype(np.int32))
    sums = jnp.asarray(rng.normal(size=(T + 8192, 3)).astype(np.float32))
    cnt = jnp.asarray(np.abs(rng.normal(size=T + 8192)).astype(np.float32) + 1)
    valid = jnp.asarray(rng.random(T + 8192) > 0.2)
    t = timed(lambda: merge_voxel_entries(cells, sums, cnt, valid, T))
    print(f"odometry incr merge {T+8192//1000}k: {t:7.2f} ms")

    # fusion surf map shape: 50 kf x 2048 = 102k
    fus = jnp.asarray(rng.uniform(-60, 60, (102400, 3)).astype(np.float32))
    fm = jnp.asarray(rng.random(102400) > 0.2)
    refl = jnp.asarray(rng.random(102400).astype(np.float32))[:, None]
    t = timed(lambda: voxel_downsample(fus, fm, 0.4, 32768, feats=refl))
    print(f"fusion surf 102k      exact single-sort : {t:7.2f} ms")
    cells2 = jnp.asarray(rng.integers(-500, 500, (36864 + 10240, 3)).astype(np.int32))
    sums2 = jnp.asarray(rng.normal(size=(36864 + 10240, 4)).astype(np.float32))
    cnt2 = jnp.asarray(np.abs(rng.normal(size=36864 + 10240)).astype(np.float32) + 1)
    valid2 = jnp.asarray(rng.random(36864 + 10240) > 0.2)
    sel = jnp.asarray(rng.random(36864 + 10240) > 0.15)
    t = timed(lambda: merge_voxel_entries(cells2, sums2, cnt2, valid2, 36864,
                                          second_sel=sel))
    print(f"fusion incr merge 47k (two reductions)  : {t:7.2f} ms")


if __name__ == "__main__":
    main()
