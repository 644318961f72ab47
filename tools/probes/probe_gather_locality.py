"""Probe: does index LOCALITY change jnp.take cost on TPU?

The refine patch gather (36 takes, 65k indices total from a 307k map)
costs ~46 ms/batch64 and is invariant to op fusion (9 takes == 1
flattened take == fused cross-layer take — probe_detect_split): the
cost is per-index random access. If the gather engine coalesces
nearby indices, pre-sorting candidates spatially (then un-sorting the
small patch results) would cut it.

Times (64, 9216)-index takes from a (307200,) i32 map with:
  random   uniform random indices (score-sorted candidates look random)
  sorted   the same indices sorted ascending per row
  clustered  random base + small offsets (3x3-patch-like)
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path[:0] = [_ROOT, os.path.join(_ROOT, "tools")]


def main():
    import jax
    import jax.numpy as jnp

    from tpu_timing import burn_in, timed

    rng = np.random.default_rng(0)
    n, b, k = 307_200, 64, 9216
    src = jnp.asarray(
        rng.integers(0, 2**30, (b, n), dtype=np.int64).astype(np.int32)
    )
    idx_rand = rng.integers(0, n, (b, k)).astype(np.int32)
    idx_sort = np.sort(idx_rand, axis=1)
    base = rng.integers(0, n - 2000, (b, k // 9)).astype(np.int32)
    idx_clus = (
        base[:, :, None]
        + np.arange(9, dtype=np.int32)[None, None, :] * 640
    ).reshape(b, k)

    print("devices", jax.devices(), flush=True)
    burn_in(4.0)

    def take(s, i):
        return jax.vmap(lambda row, ii: jnp.take(row, ii))(s, i)

    timed("take random  (64,9216)", take, src, jnp.asarray(idx_rand))
    timed("take sorted  (64,9216)", take, src, jnp.asarray(idx_sort))
    timed("take cluster (64,9216)", take, src, jnp.asarray(idx_clus))
    # Smaller index count for scaling reference.
    timed("take random  (64,1024)", take, src,
          jnp.asarray(idx_rand[:, :1024]))
    # 1-D source shared across batch (refine gathers per frame from its
    # own map; this isolates the per-index cost with one map).
    src1 = src[0]
    timed("take 1-map random (9216,)",
          lambda i: jnp.take(src1, i), jnp.asarray(idx_rand[0]))


if __name__ == "__main__":
    main()
