"""Probe 4: separate dispatch overhead from real lane-gather rate.

Runs the same lane-gather kernel at 2M / 16M / 64M elements per call;
if time/call is flat, the ~11 ms floor is tunnel dispatch, not compute.
Also re-probes the dynamic-offset DMA with sublane-aligned output blocks.
"""
from __future__ import annotations

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    def k_g(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    BLK = 2048
    for m in (16384, 131072, 524288):
        tab = jnp.asarray(
            rng.integers(0, 1000, (m, 128), dtype=np.int32)
        )
        idx = jnp.asarray(rng.integers(0, 128, (m, 128), dtype=np.int32))

        def gather_big(t, i, m=m):
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

        fn = jax.jit(gather_big)
        out = fn(tab, idx)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        float(np.asarray(jnp.sum(fn(tab, idx).astype(jnp.float32))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(5):
            acc = acc + jnp.sum(fn(tab, idx).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / 5
        nel = m * 128
        print(
            f"lane gather {nel/1e6:5.1f} Mel/call: {dt*1e3:8.2f} ms "
            f"({nel/dt/1e6:.0f} Mel/s)",
            flush=True,
        )
        time.sleep(2)

    # Dynamic-offset DMA, 8 patches per grid step, (8,128) out blocks.
    img = jnp.asarray(rng.integers(0, 255, (488, 768), dtype=np.int32))
    n_kp = 512
    ax = jnp.asarray(rng.integers(0, 768 - 128, n_kp, dtype=np.int32))
    ay = jnp.asarray(rng.integers(0, 488 - 96, n_kp, dtype=np.int32))

    def k_dma(ax_ref, ay_ref, img_ref, o_ref, patch, sem):
        g = pl.program_id(0)
        for j in range(8):
            kk = g * 8 + j
            cp = pltpu.make_async_copy(
                img_ref.at[pl.ds(ay_ref[kk], 96), pl.ds(ax_ref[kk], 128)],
                patch,
                sem,
            )
            cp.start()
            cp.wait()
            o_ref[j, :] = jnp.sum(patch[:], axis=0)

    def dma_patches(img_, ax_, ay_):
        return pl.pallas_call(
            k_dma,
            out_shape=jax.ShapeDtypeStruct((n_kp, 128), jnp.int32),
            grid=(n_kp // 8,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((96, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(ax_, ay_, img_)

    try:
        fn = jax.jit(dma_patches)
        out = fn(img, ax, ay)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        float(np.asarray(jnp.sum(fn(img, ax, ay).astype(jnp.float32))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(5):
            acc = acc + jnp.sum(fn(img, ax, ay).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / 5
        print(
            f"dyn-offset DMA 512x(96x128) i32: {dt*1e3:8.2f} ms "
            f"sum={s:.0f} ({512*96*128*4/dt/1e9:.1f} GB/s)",
            flush=True,
        )
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        keep = [ln for ln in tb if "Error" in ln or "require" in ln][-2:]
        print(f"dyn-offset DMA FAIL {' | '.join(keep)[:300]}", flush=True)


if __name__ == "__main__":
    main()
