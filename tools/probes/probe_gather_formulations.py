"""Microbenchmark gather formulations for the descriptor sampler.

Question: the describe stage spends ~280 ms/batch-16 in XLA gathers
(~21.6M taps). Mosaic lane-gather runs at ~9 Gel/s. Which formulation of
"taps[k, j] = I[y[k,j], x[k,j]]" is fastest on this backend?

  P1  XLA 2D advanced-index gather from (481, 644)    [current sampler]
  P2  XLA 1D take from flattened image
  P3  XLA take_along_axis axis=1, (K, 4096) patches -> (K, 4752)
  P4  XLA take_along_axis axis=0, (4096, 128) src, (4752, 128) idx
  P5  Pallas take_along_axis axis=0 (sublane gather), same shapes
  P6  XLA patch extraction I[ay+r, ax+c] -> (K, 64, 64)
  P7  Pallas take_along_axis axis=1 block-chunked     [probe4 re-check]

Honest timing: device-side checksum chained, ONE host readback.
Paced: sleep between compiles (remote compile service wedges).
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

K = 16384          # total keypoints (batch 16 x 1024)
J = 4752           # taps per keypoint (132 pts x 36 grid)
H, W = 481, 644


def timeit(name, fn, *args, iters=5, nel=None):
    try:
        f = jax.jit(fn)
        out = f(*args)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        float(np.asarray(jnp.sum(f(*args).astype(jnp.float32))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + jnp.sum(f(*args).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        rate = (nel / dt / 1e6) if nel else 0
        print(
            f"{name:44s} {dt*1e3:9.2f} ms  {rate:9.0f} Mel/s  sum={s:.3g}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{name:44s} FAIL {msg}", flush=True)
    time.sleep(3)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 2**22, (H, W), dtype=np.int32))
    yy = jnp.asarray(rng.integers(0, H, (K, J), dtype=np.int32))
    xx = jnp.asarray(rng.integers(0, W, (K, J), dtype=np.int32))

    # P1: current formulation.
    timeit("P1 XLA 2D adv-index I[y,x] (K,J)", lambda y, x: img[y, x],
           yy, xx, nel=K * J)

    # P2: flattened 1D take.
    flat = img.reshape(-1)
    lin = yy * W + xx
    timeit("P2 XLA 1D take flat (K,J)",
           lambda l: jnp.take(flat, l, axis=0), lin, nel=K * J)

    # P3: per-keypoint patch source, last-axis take_along_axis.
    patches = jnp.asarray(
        rng.integers(0, 2**22, (K, 4096), dtype=np.int32)
    )
    pidx = jnp.asarray(rng.integers(0, 4096, (K, J), dtype=np.int32))
    timeit("P3 XLA take_along axis=1 (K,4096)->(K,J)",
           lambda p, i: jnp.take_along_axis(p, i, axis=1),
           patches, pidx, nel=K * J)

    # P4: transposed layout, axis=0 gather (keypoints on lanes).
    nblk = K // 128
    srcT = jnp.asarray(
        rng.integers(0, 2**22, (nblk, 4096, 128), dtype=np.int32)
    )
    idxT = jnp.asarray(
        rng.integers(0, 4096, (nblk, J, 128), dtype=np.int32)
    )
    timeit("P4 XLA take_along axis=0 (B,4096,128)",
           lambda s, i: jnp.take_along_axis(s, i, axis=0 + 1),
           srcT, idxT, nel=K * J)

    # P5: Pallas sublane gather, same shapes.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_sub(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    def sub_gather(s, i):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((nblk, J, 128), jnp.int32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 4096, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, J, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, J, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i)

    def k_sub2(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            s_ref[0], i_ref[0], axis=0
        )[None]

    def sub_gather2(s, i):
        return pl.pallas_call(
            k_sub2,
            out_shape=jax.ShapeDtypeStruct((nblk, J, 128), jnp.int32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 4096, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, J, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, J, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i)

    timeit("P5a Pallas take_along axis=0 3D", sub_gather, srcT, idxT,
           nel=K * J)
    timeit("P5b Pallas take_along axis=0 2D-squeezed", sub_gather2,
           srcT, idxT, nel=K * J)

    # P6: XLA patch extraction (row-contiguous gather).
    ay = jnp.asarray(rng.integers(0, H - 64, (K,), dtype=np.int32))
    ax = jnp.asarray(rng.integers(0, W - 64, (K,), dtype=np.int32))
    rr = jnp.arange(64, dtype=jnp.int32)

    def extract(ay_, ax_):
        return img[
            ay_[:, None, None] + rr[None, :, None],
            ax_[:, None, None] + rr[None, None, :],
        ]

    timeit("P6 XLA patch extract (K,64,64)", extract, ay, ax,
           nel=K * 64 * 64)

    # P7: Pallas lane gather re-check (known-good shape).
    def k_g(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    m = 131072
    tab = jnp.asarray(rng.integers(0, 1000, (m, 128), dtype=np.int32))
    li = jnp.asarray(rng.integers(0, 128, (m, 128), dtype=np.int32))

    def gather_big(t, i):
        return pl.pallas_call(
            k_g,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // 2048,),
            in_specs=[
                pl.BlockSpec((2048, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2048, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2048, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    timeit("P7 Pallas take_along axis=1 (ref)", gather_big, tab, li,
           nel=m * 128)


if __name__ == "__main__":
    main()
