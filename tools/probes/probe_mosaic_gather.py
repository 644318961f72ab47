"""Probe which gather forms Mosaic TPU supports inside Pallas kernels.

Small shapes, full tracebacks (last 3 lines), one compile at a time.
"""
from __future__ import annotations

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, out_shape, args):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        s = float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        print(f"{name:<52s} OK   sum={s:.0f}", flush=True)
        return True
    except Exception:  # noqa: BLE001
        tb = traceback.format_exc().strip().splitlines()
        msg = " | ".join(tb[-2:])[:300]
        print(f"{name:<52s} FAIL {msg}", flush=True)
        return False


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1000, (256, 128), dtype=np.int32))
    tabf = tab.astype(jnp.float32)
    idx_r = jnp.asarray(rng.integers(0, 256, (8, 128), dtype=np.int32))
    idx_big = jnp.asarray(rng.integers(0, 256, (256, 128), dtype=np.int32))
    idx_l = jnp.asarray(rng.integers(0, 128, (256, 128), dtype=np.int32))
    idx_l1 = jnp.asarray(rng.integers(0, 128, (256, 1), dtype=np.int32))

    # 1. take_along_axis axis=0, idx same width, fewer rows
    probe(
        "taa axis=0 i32 (8,128) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=0)
        ),
        jax.ShapeDtypeStruct((8, 128), jnp.int32),
        (tab, idx_r),
    )
    # 2. same rows as operand
    probe(
        "taa axis=0 i32 (256,128) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=0)
        ),
        jax.ShapeDtypeStruct((256, 128), jnp.int32),
        (tab, idx_big),
    )
    # 3. f32 table
    probe(
        "taa axis=0 f32 (256,128) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=0)
        ),
        jax.ShapeDtypeStruct((256, 128), jnp.float32),
        (tabf, idx_big),
    )
    # 4. take_along_axis axis=1 full width idx
    probe(
        "taa axis=1 i32 (256,128) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=1)
        ),
        jax.ShapeDtypeStruct((256, 128), jnp.int32),
        (tab, idx_l),
    )
    # 5. take_along_axis axis=1 single col idx
    probe(
        "taa axis=1 i32 (256,1) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=1)
        ),
        jax.ShapeDtypeStruct((256, 1), jnp.int32),
        (tab, idx_l1),
    )
    # 6. f32 axis=1
    probe(
        "taa axis=1 f32 (256,128) idx",
        lambda t, i, o: o.__setitem__(
            slice(None), jnp.take_along_axis(t[:], i[:], axis=1)
        ),
        jax.ShapeDtypeStruct((256, 128), jnp.float32),
        (tabf, idx_l),
    )
    # 7. lax.gather-free alternative: dynamic roll via pltpu.roll? skip.
    # 8. one_hot matmul reference inside kernel (always works)
    probe(
        "one-hot matmul lane select f32",
        lambda t, i, o: o.__setitem__(
            slice(None),
            jax.lax.dot_general(
                (i[:, :1] == jax.lax.broadcasted_iota(
                    jnp.int32, (256, 128), 1
                )).astype(jnp.float32) * t[:],
                jnp.ones((128, 1), jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
        ),
        jax.ShapeDtypeStruct((256, 1), jnp.float32),
        (tabf, idx_l),
    )


if __name__ == "__main__":
    main()
