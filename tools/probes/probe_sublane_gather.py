"""Probe: does Mosaic lower take_along_axis along axis=0 (sublane gather)?

Design at stake: transposed per-keypoint patches (4096, 128kp) + one
sublane gather (4752, 128) -> descriptor taps at Gel/s instead of the
~80 Mel/s XLA gather path. Captures full tracebacks (probe4's P5b
failed with an empty message).
"""
from __future__ import annotations

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, build, *args, iters=5, nel=None):
    try:
        f = jax.jit(build)
        out = f(*args)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        # Correctness check vs numpy when feasible.
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + jnp.sum(f(*args).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        rate = (nel / dt / 1e6) if nel else 0
        print(f"{name:40s} {dt*1e3:9.2f} ms {rate:9.0f} Mel/s sum={s:.6g}",
              flush=True)
        return out
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        print(f"{name:40s} FAIL", flush=True)
        for ln in tb[-12:]:
            print(f"    {ln[:160]}", flush=True)
        return None
    finally:
        time.sleep(3)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # --- Small correctness probe first.
    S, J = 512, 256
    src_np = rng.integers(0, 1 << 22, (S, 128), dtype=np.int32)
    idx_np = rng.integers(0, S, (J, 128), dtype=np.int32)
    src = jnp.asarray(src_np)
    idx = jnp.asarray(idx_np)

    def k_sub(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    def sub_small(s, i):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((J, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, i)

    out = run("A sublane take_along (512,128)->(256,)", sub_small, src, idx,
              nel=J * 128)
    if out is not None:
        want = np.take_along_axis(src_np, idx_np, axis=0)
        ok = np.array_equal(np.asarray(out), want)
        print(f"    correctness: {'OK' if ok else 'MISMATCH'}", flush=True)

    # --- Full-size: (4096, 128) src, (4752, 128) idx, gridded over blocks.
    nblk = 128
    S2, J2 = 4096, 4752
    srcT = jnp.asarray(
        rng.integers(0, 1 << 22, (nblk * S2, 128), dtype=np.int32)
    )
    idxT = jnp.asarray(rng.integers(0, S2, (nblk * J2, 128), dtype=np.int32))

    def k_sub_blk(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    def sub_big(s, i):
        return pl.pallas_call(
            k_sub_blk,
            out_shape=jax.ShapeDtypeStruct((nblk * J2, 128), jnp.int32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((S2, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J2, 128), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((J2, 128), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i)

    run("B sublane gather 128x(4096,128)", sub_big, srcT, idxT,
        nel=nblk * J2 * 128)

    # --- C: uint8 source (descriptor path could gather u8 image bytes).
    src8 = jnp.asarray(rng.integers(0, 255, (S, 128), dtype=np.uint8))

    def sub_u8(s, i):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((J, 128), jnp.uint8),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, i)

    run("C sublane take_along u8", sub_u8, src8, idx, nel=J * 128)

    # --- D: in-kernel relayout (64,64) -> (4096,1) column write probe.
    pat = jnp.asarray(rng.integers(0, 1 << 22, (128, 64, 64), dtype=np.int32))

    def k_relay(p_ref, o_ref):
        def body(k, _):
            o_ref[:, pl.ds(k, 1)] = p_ref[k].reshape(4096, 1)
            return 0

        jax.lax.fori_loop(0, 128, body, 0)

    def relay(p):
        return pl.pallas_call(
            k_relay,
            out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p)

    out = run("D relayout 128x(64,64)->cols", relay, pat, nel=128 * 4096)
    if out is not None:
        want = np.asarray(pat).reshape(128, 4096).T
        ok = np.array_equal(np.asarray(out), want)
        print(f"    correctness: {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
