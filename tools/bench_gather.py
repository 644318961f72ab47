"""Microbenchmark: gather strategies for descriptor sampling on TPU.

The describe stage is ~21M random 4-byte reads per batch; this measures
which lowering the hardware likes (honest checksum timing).

  python tools/bench_gather.py [n_taps_millions]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def timed(name, fn, *args, iters=5):
    import jax
    import jax.numpy as jnp

    fn_j = jax.jit(fn)
    for _ in range(2):
        out = fn_j(*args)
        float(np.asarray(jnp.sum(out, dtype=jnp.float32)))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + jnp.sum(fn_j(*args), dtype=jnp.float32)
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    n = int(float(sys.argv[1] if len(sys.argv) > 1 else 2) * 1e6)
    h, w = 481, 641
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**20, (h, w), dtype=np.int32))
    ys = jnp.asarray(rng.integers(0, h, n, dtype=np.int32))
    xs = jnp.asarray(rng.integers(0, w, n, dtype=np.int32))
    # Locally-clustered indices (like per-keypoint pattern taps): 1024
    # cluster centers, 2048 taps each within +-64.
    n_c = max(n // 2048, 1)
    cy = rng.integers(64, h - 64, n_c)
    cx = rng.integers(64, w - 64, n_c)
    off = rng.integers(-64, 64, (n_c, 2048, 2))
    ys_c = jnp.asarray(
        np.clip(cy[:, None] + off[..., 0], 0, h - 1).reshape(-1)[:n]
        .astype(np.int32)
    )
    xs_c = jnp.asarray(
        np.clip(cx[:, None] + off[..., 1], 0, w - 1).reshape(-1)[:n]
        .astype(np.int32)
    )

    print(f"device: {jax.devices()[0]}; taps: {n/1e6:.1f}M", flush=True)

    def g2d(t, y, x):
        return t[y, x]

    def g1d(t, y, x):
        return jnp.take(t.reshape(-1), y * w + x)

    def g1d_sorted(t, y, x):
        idx = y * w + x
        order = jnp.argsort(idx)
        vals = jnp.take(t.reshape(-1), idx[order])
        inv = jnp.argsort(order)
        return jnp.take(vals, inv)

    def g_rowcol(t, y, x):
        # Axis-separable: row-gather then per-row column gather.
        rows = jnp.take(t, y, axis=0)            # (n, w)  -- materializes!
        return jnp.take_along_axis(rows, x[:, None], axis=1)[:, 0]

    timed("2d fancy-index (uniform)", g2d, table, ys, xs)
    time.sleep(1)
    timed("1d flat take (uniform)", g1d, table, ys, xs)
    time.sleep(1)
    timed("2d fancy-index (clustered)", g2d, table, ys_c, xs_c)
    time.sleep(1)
    timed("1d flat take (clustered)", g1d, table, ys_c, xs_c)
    time.sleep(1)
    timed("1d flat sorted+unsort (uniform)", g1d_sorted, table, ys, xs)
    if n <= 300_000:
        timed("row gather + col select", g_rowcol, table, ys, xs)

    # 16-gather fusion shape: does one big gather beat 16 small ones?
    n16 = n // 16
    ys16 = [jnp.asarray(rng.integers(0, h, n16, dtype=np.int32))
            for _ in range(16)]
    xs16 = [jnp.asarray(rng.integers(0, w, n16, dtype=np.int32))
            for _ in range(16)]

    def g16(t, *yx):
        yy = yx[:16]
        xx = yx[16:]
        return sum(t[y, x] for y, x in zip(yy, xx))

    timed("16 separate gathers (n/16 each)", g16, table, *ys16, *xs16)

    # uint8 source table vs int32
    table8 = table.astype(jnp.uint8)

    def g2d8(t, y, x):
        return t[y, x].astype(jnp.int32)

    time.sleep(1)
    timed("2d fancy-index from uint8", g2d8, table8, ys, xs)

    print("done", flush=True)


if __name__ == "__main__":
    main()
