"""Probe 3: throughput of the descriptor-sampler building blocks.

  a) lane gather (N,128)x(N,128) timed at scale
  b) in-kernel transpose (128,128)
  c) transpose + lane gather chain (the cross-sublane select)
  d) dynamic-offset DMA: HBM -> VMEM patch at a traced offset
  e) u8 lane gather
"""
from __future__ import annotations

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, iters=5):
    try:
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        float(np.asarray(jnp.sum(fn_j(*args).astype(jnp.float32))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + jnp.sum(fn_j(*args).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        n_el = int(np.prod(out.shape))
        print(
            f"{name:<46s} OK sum={s:.0f} {dt*1e3:8.3f} ms "
            f"({n_el/dt/1e6:.0f} Mel/s)",
            flush=True,
        )
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        keep = [ln for ln in tb if "Error" in ln or "NotImplemented" in ln]
        print(f"{name:<46s} FAIL {' | '.join(keep[-2:])[:240]}", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    m = 16384

    tab = jnp.asarray(rng.integers(0, 1000, (m, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (m, 128), dtype=np.int32))

    BLK = 2048

    def k_g(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def gather_big(t, i):
        return pl.pallas_call(
            k_g,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    run("a) lane gather 2M elements", gather_big, tab, idx)
    time.sleep(2)

    def k_t(t_ref, o_ref):
        x = t_ref[:]
        for _ in range(8):
            x = x.T
            x = x + 1
        o_ref[:] = x

    def transpose_many(t):
        return pl.pallas_call(
            k_t,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // 128,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t)

    run("b) 8x chained transpose 128x128 (x128 blocks)", transpose_many, tab)
    time.sleep(2)

    def k_gt(t_ref, i_ref, o_ref):
        a = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)  # (128,128)
        at = a.T
        o_ref[:] = jnp.take_along_axis(at, i_ref[:], axis=1)

    def chain(t, i):
        return pl.pallas_call(
            k_gt,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // 128,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    run("c) gather+transpose+gather chain", chain, tab, idx)
    time.sleep(2)

    # d) dynamic-offset DMA: per grid step, copy a (96, 128) patch from an
    # HBM image at offsets from SMEM scalars, then reduce it.
    img = jnp.asarray(
        rng.integers(0, 255, (481, 768), dtype=np.int32)
    )
    n_kp = 512
    ax = jnp.asarray(rng.integers(0, 768 - 128, n_kp, dtype=np.int32))
    ay = jnp.asarray(rng.integers(0, 481 - 96, n_kp, dtype=np.int32))

    def k_dma(ax_ref, ay_ref, img_ref, o_ref, patch, sem):
        k = pl.program_id(0)
        a_x = ax_ref[k]
        a_y = ay_ref[k]
        cp = pltpu.make_async_copy(
            img_ref.at[pl.ds(a_y, 96), pl.ds(a_x, 128)], patch, sem
        )
        cp.start()
        cp.wait()
        o_ref[0, :] = jnp.sum(patch[:], axis=0)

    def dma_patches(img_, ax_, ay_):
        return pl.pallas_call(
            k_dma,
            out_shape=jax.ShapeDtypeStruct((n_kp, 128), jnp.int32),
            grid=(n_kp,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((96, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ax_, ay_, img_)

    run("d) dynamic-offset DMA 512 patches 96x128", dma_patches, img, ax, ay)
    time.sleep(2)

    tab8 = jnp.asarray(rng.integers(0, 255, (m, 128), dtype=np.uint8))

    def k_g8(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            t_ref[:].astype(jnp.int32), i_ref[:], axis=1
        )

    def gather8(t, i):
        return pl.pallas_call(
            k_g8,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.int32),
            grid=(m // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    run("e) u8->i32 lane gather 2M", gather8, tab8, idx)


if __name__ == "__main__":
    main()
