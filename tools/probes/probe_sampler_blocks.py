"""Probe 6: the Pallas descriptor-sampler building blocks, settled.

Design under test (describe stage, brisk-descriptor-extractor.cc:612-778
spec): per 128-keypoint block,
  1. per-keypoint dynamic-offset DMA HBM->VMEM integral patches
     (64, 64) -> slab (128, 64, 64);
  2. view slab as (8192, 64) [rows = (kp, patch-row)];
  3. 6x sublane gather (idx.shape == src.shape) -> per-(kp, point) rows
     holding one full patch row each;
  4. 6x lane gather -> the 6 needed cols packed to lanes 0..5.

Probes:
  A  lane-gather rate at scale (grid-blocked; separates dispatch floor)
  B  sublane gather (8192, 64), idx == src shape: correctness + rate
  C  in-kernel reshape (128, 64, 64) -> (8192, 64): correctness
  D  per-keypoint dynamic-offset DMA loop: correctness + rate

Honest timing: device-side checksum chained across iters, one readback.
Paced (compile service wedges): sleep between probes.
"""
from __future__ import annotations

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, iters=5, nel=None, want=None):
    try:
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        ok = ""
        if want is not None:
            ok = (
                " correctness=OK"
                if np.array_equal(np.asarray(out), want)
                else " correctness=MISMATCH"
            )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + jnp.sum(fn_j(*args).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        rate = (nel / dt / 1e6) if nel else 0
        print(
            f"{name:46s} {dt*1e3:9.2f} ms {rate:9.0f} Mel/s{ok}",
            flush=True,
        )
        return out
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        print(f"{name:46s} FAIL", flush=True)
        for ln in tb[-8:]:
            print(f"    {ln[:170]}", flush=True)
        return None
    finally:
        time.sleep(3)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---- A: lane-gather rate, grid-blocked at three scales.
    def k_lane(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def lane_scaled(nblk):
        src = jnp.asarray(
            rng.integers(0, 1 << 22, (nblk * 8192, 128), dtype=np.int32)
        )
        idx = jnp.asarray(
            rng.integers(0, 128, (nblk * 8192, 128), dtype=np.int32)
        )

        def f(s, i):
            return pl.pallas_call(
                k_lane,
                out_shape=jax.ShapeDtypeStruct((nblk * 8192, 128), jnp.int32),
                grid=(nblk,),
                in_specs=[
                    pl.BlockSpec((8192, 128), lambda b: (b, 0)),
                    pl.BlockSpec((8192, 128), lambda b: (b, 0)),
                ],
                out_specs=pl.BlockSpec((8192, 128), lambda b: (b, 0)),
            )(s, i)

        run(f"A lane gather {nblk} blk ({nblk*8192*128//1000000}M)",
            f, src, idx, nel=nblk * 8192 * 128)

    lane_scaled(8)
    lane_scaled(32)

    # ---- B: sublane gather, idx.shape == src.shape == (8192, 64).
    S, W = 8192, 64
    src_np = rng.integers(0, 1 << 22, (S, W), dtype=np.int32)
    idx_np = rng.integers(0, S, (S, W), dtype=np.int32)
    want = np.take_along_axis(src_np, idx_np, axis=0)

    def k_sub(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    def f_sub(s, i):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((S, W), jnp.int32),
        )(s, i)

    run("B1 sublane gather (8192,64) idx==src", f_sub,
        jnp.asarray(src_np), jnp.asarray(idx_np), nel=S * W, want=want)

    # B2: rate at scale (grid over 32 blocks).
    def f_sub_big(s, i):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((32 * S, W), jnp.int32),
            grid=(32,),
            in_specs=[
                pl.BlockSpec((S, W), lambda b: (b, 0)),
                pl.BlockSpec((S, W), lambda b: (b, 0)),
            ],
            out_specs=pl.BlockSpec((S, W), lambda b: (b, 0)),
        )(s, i)

    sb = jnp.asarray(rng.integers(0, 1 << 22, (32 * S, W), dtype=np.int32))
    ib = jnp.asarray(rng.integers(0, S, (32 * S, W), dtype=np.int32))
    run("B2 sublane gather 32x(8192,64)", f_sub_big, sb, ib,
        nel=32 * S * W)

    # ---- C: reshape (128, 64, 64) -> (8192, 64) in-kernel.
    pat_np = rng.integers(0, 1 << 22, (128, 64, 64), dtype=np.int32)

    def k_resh(p_ref, o_ref):
        o_ref[:] = p_ref[:].reshape(8192, 64)

    def f_resh(p):
        return pl.pallas_call(
            k_resh,
            out_shape=jax.ShapeDtypeStruct((8192, 64), jnp.int32),
        )(p)

    run("C reshape (128,64,64)->(8192,64)", f_resh, jnp.asarray(pat_np),
        nel=128 * 4096, want=pat_np.reshape(8192, 64))

    # ---- D: per-keypoint dynamic-offset DMA HBM -> VMEM slab.
    H, Wimg = 488, 768
    img_np = rng.integers(0, 1 << 22, (H, Wimg), dtype=np.int32)
    K = 128
    ax_np = rng.integers(0, Wimg - 64, (K,), dtype=np.int32)
    ay_np = rng.integers(0, H - 64, (K,), dtype=np.int32)
    want_d = np.stack(
        [img_np[ay_np[k]:ay_np[k] + 64, ax_np[k]:ax_np[k] + 64]
         for k in range(K)]
    ).reshape(8192, 64)

    def k_dma(ax_ref, ay_ref, img_ref, o_ref):
        def inner(sem):
            def body(k, _):
                ax = ax_ref[k]
                ay = ay_ref[k]
                dma = pltpu.make_async_copy(
                    img_ref.at[pl.ds(ay, 64), pl.ds(ax, 64)],
                    o_ref.at[pl.ds(k * 64, 64), :],
                    sem,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(0, K, body, 0)

        pl.run_scoped(inner, sem=pltpu.SemaphoreType.DMA(()))

    def f_dma(ax, ay, img):
        return pl.pallas_call(
            k_dma,
            out_shape=jax.ShapeDtypeStruct((K * 64, 64), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ax, ay, img)

    run("D dyn-offset DMA 128x(64,64)", f_dma,
        jnp.asarray(ax_np), jnp.asarray(ay_np), jnp.asarray(img_np),
        nel=K * 4096, want=want_d)

    # D2: overlapped DMAs (start all with per-slot sems, then wait).
    NSEM = 8

    def k_dma2(ax_ref, ay_ref, img_ref, o_ref):
        def inner(sems):
            def body(k, _):
                dma = pltpu.make_async_copy(
                    img_ref.at[pl.ds(ay_ref[k], 64), pl.ds(ax_ref[k], 64)],
                    o_ref.at[pl.ds(k * 64, 64), :],
                    sems.at[k % NSEM],
                )
                dma.start()

                @pl.when(k >= NSEM - 1)
                def _():
                    j = k - (NSEM - 1)
                    pltpu.make_async_copy(
                        img_ref.at[pl.ds(ay_ref[j], 64),
                                   pl.ds(ax_ref[j], 64)],
                        o_ref.at[pl.ds(j * 64, 64), :],
                        sems.at[j % NSEM],
                    ).wait()

                return 0

            jax.lax.fori_loop(0, K, body, 0)

            def tail(t, _):
                j = K - (NSEM - 1) + t
                pltpu.make_async_copy(
                    img_ref.at[pl.ds(ay_ref[j], 64), pl.ds(ax_ref[j], 64)],
                    o_ref.at[pl.ds(j * 64, 64), :],
                    sems.at[j % NSEM],
                ).wait()
                return 0

            jax.lax.fori_loop(0, NSEM - 1, tail, 0)

        pl.run_scoped(inner, sems=pltpu.SemaphoreType.DMA((NSEM,)))

    def f_dma2(ax, ay, img):
        return pl.pallas_call(
            k_dma2,
            out_shape=jax.ShapeDtypeStruct((K * 64, 64), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ax, ay, img)

    run("D2 overlapped DMA 128x(64,64)", f_dma2,
        jnp.asarray(ax_np), jnp.asarray(ay_np), jnp.asarray(img_np),
        nel=K * 4096, want=want_d)


if __name__ == "__main__":
    main()
