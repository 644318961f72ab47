"""Microbenchmark: Pallas VMEM-resident table gather vs XLA HBM gather.

The describe stage is ~21M random 4-byte reads from a 1.2 MB integral
image; XLA gathers from HBM run ~13-80 ms/Mtap on the bench slice.
Mosaic reports "Only 2D gather is supported": this probes the supported
form — jnp.take_along_axis on 2D operands — as a two-stage
row-gather (axis 0, cross-sublane) + lane-select (axis 1, cross-lane)
against a VMEM-pinned (R, 128) reshape of the table.

  python tools/bench_pallas_gather.py [n_taps_millions]
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
    try:
        for _ in range(2):
            out = fn_j(*args)
            float(np.asarray(jnp.sum(out, dtype=jnp.float32)))
    except Exception as e:  # noqa: BLE001
        print(f"{name:<44s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(float(sys.argv[1] if len(sys.argv) > 1 else 2) * 1e6)
    h, w = 481, 641
    rows_t = 2432  # ceil(h*w/128) rounded to a multiple of 8
    rng = np.random.default_rng(0)
    table = rng.integers(0, 2**20, (h, w), dtype=np.int32)
    tabp = np.zeros((rows_t * 128,), np.int32)
    tabp[: h * w] = table.reshape(-1)
    tab2 = jnp.asarray(tabp.reshape(rows_t, 128))
    # Clustered indices (like per-keypoint pattern taps).
    n_c = max(n // 2048, 1)
    cy = rng.integers(64, h - 64, n_c)
    cx = rng.integers(64, w - 64, n_c)
    off = rng.integers(-64, 64, (n_c, 2048, 2))
    ys_c = np.clip(cy[:, None] + off[..., 0], 0, h - 1).reshape(-1)[:n]
    xs_c = np.clip(cx[:, None] + off[..., 1], 0, w - 1).reshape(-1)[:n]
    flat = (ys_c * w + xs_c).astype(np.int32)
    row_i = jnp.asarray(flat // 128)
    col_i = jnp.asarray(flat % 128)

    print(f"device: {jax.devices()[0]}; taps: {n/1e6:.1f}M", flush=True)

    def xla_take(t, r, c):
        return jnp.take(t.reshape(-1), r * 128 + c)

    timed("XLA flat take (clustered, HBM)", xla_take, tab2, row_i, col_i)

    BLK = 2048

    def k_2stage(tab_ref, r_ref, c_ref, out_ref):
        r = r_ref[:]                       # (BLK,)
        c = c_ref[:]
        rows = jnp.take_along_axis(
            tab_ref[:], r[:, None] * jnp.ones((1, 128), jnp.int32), axis=0
        )                                  # (BLK, 128)
        vals = jnp.take_along_axis(rows, c[:, None], axis=1)  # (BLK, 1)
        out_ref[:] = vals[:, 0]

    def pallas_2stage(t, r, c):
        m = r.shape[0]
        return pl.pallas_call(
            k_2stage,
            out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
            grid=(m // BLK,),
            in_specs=[
                pl.BlockSpec((rows_t, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(t, r, c)

    n_round = (n // BLK) * BLK
    timed("Pallas 2-stage take_along_axis", pallas_2stage, tab2,
          row_i[:n_round], col_i[:n_round])

    # Variant: indices pre-shaped 2D outside ((M/128, 128) layout), row
    # gather only — measures the cross-sublane stage alone.
    def k_rows(tab_ref, r_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], r_ref[:], axis=0)

    def pallas_rows(t, r2):
        m = r2.shape[0]
        return pl.pallas_call(
            k_rows,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // BLK,),
            in_specs=[
                pl.BlockSpec((rows_t, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(t, r2)

    r2 = jnp.tile(row_i[: n_round // 128, None], (1, 128))
    timed("Pallas row-gather only (n/128 rows x128)", pallas_rows, tab2, r2)

    # Variant: lane-select only ((M,128) -> (M,1)).
    def k_lane(rows_ref, c_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            rows_ref[:], c_ref[:][:, None], axis=1
        )[:, 0]

    def pallas_lane(rows, c):
        m = c.shape[0]
        return pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
            grid=(m // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
        )(rows, c)

    rows_big = jnp.asarray(
        rng.integers(0, 2**20, (n_round, 128), dtype=np.int32)
    )
    timed("Pallas lane-select only", pallas_lane, rows_big, col_i[:n_round])

    print("done", flush=True)


if __name__ == "__main__":
    main()
