"""Probe 2: width limits + throughput of Mosaic's lane gather.

take_along_axis(axis=1) with (N, 128) idx works. Tests:
  - source wider than 128 lanes (W=256, 2432, 65536) — can a lane gather
    cross 128-lane tiles?
  - dtypes: i32, u8.
  - throughput at scale for the supported forms.
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


def probe(name, kernel, out_shape, args, iters=0):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        msg = f"OK   sum={s:.0f}"
        if iters:
            float(np.asarray(jnp.sum(fn_j(*args).astype(jnp.float32))))
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            for _ in range(iters):
                acc = acc + jnp.sum(fn_j(*args).astype(jnp.float32))
            float(np.asarray(acc))
            dt = (time.perf_counter() - t0) / iters
            n_el = int(np.prod(out_shape.shape))
            msg += f"  {dt*1e3:8.3f} ms ({n_el/dt/1e6:.0f} Mtap/s)"
        print(f"{name:<46s} {msg}", flush=True)
        return True
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        keep = [ln for ln in tb if "Error" in ln or "error" in ln][-2:]
        print(f"{name:<46s} FAIL {' | '.join(keep)[:260]}", flush=True)
        return False


def taa1(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=1)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    for w in (256, 2432, 65536):
        n = 256 if w < 65536 else 8
        tab = jnp.asarray(rng.integers(0, 1000, (n, w), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, w, (n, 128), dtype=np.int32))
        probe(
            f"taa axis=1 i32 src(({n},{w})) idx(({n},128))",
            taa1,
            jax.ShapeDtypeStruct((n, 128), jnp.int32),
            (tab, idx),
        )
        time.sleep(2)

    tab8 = jnp.asarray(rng.integers(0, 255, (256, 128), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, 128, (256, 128), dtype=np.int32))
    probe(
        "taa axis=1 u8 src((256,128))",
        taa1,
        jax.ShapeDtypeStruct((256, 128), jnp.uint8),
        (tab8, idx),
    )
    time.sleep(2)

    # Throughput: big supported case, 2M elements per call.
    m = 16384
    tabm = jnp.asarray(rng.integers(0, 1000, (m, 128), dtype=np.int32))
    idxm = jnp.asarray(rng.integers(0, 128, (m, 128), dtype=np.int32))
    probe(
        "taa axis=1 i32 (16384,128) timed",
        taa1,
        jax.ShapeDtypeStruct((m, 128), jnp.int32),
        (tabm, idxm),
        iters=5,
    )
    time.sleep(2)

    # Throughput of wide form if supported: (256, 2432) source repeated
    # gathers: grid over 64 steps, same source block each step.
    n, w = 256, 2432
    tabw = jnp.asarray(rng.integers(0, 1000, (n, w), dtype=np.int32))
    idxw = jnp.asarray(
        rng.integers(0, w, (64 * n, 128), dtype=np.int32)
    )

    def wide(t, i):
        return pl.pallas_call(
            taa1,
            out_shape=jax.ShapeDtypeStruct((64 * n, 128), jnp.int32),
            grid=(64,),
            in_specs=[
                pl.BlockSpec((n, w), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    try:
        fn = jax.jit(wide)
        out = fn(tabw, idxw)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(5):
            acc = acc + jnp.sum(fn(tabw, idxw).astype(jnp.float32))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / 5
        n_el = 64 * n * 128
        print(f"{'wide (256,2432) gather timed':<46s} OK   "
              f"{dt*1e3:8.3f} ms ({n_el/dt/1e6:.0f} Mtap/s)", flush=True)
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        keep = [ln for ln in tb if "Error" in ln][-1:]
        print(f"{'wide (256,2432) gather timed':<46s} FAIL "
              f"{' | '.join(keep)[:240]}", flush=True)


if __name__ == "__main__":
    main()
