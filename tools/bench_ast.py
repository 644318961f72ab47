"""Batched AST (BriskFeatureDetector) throughput on TPU.

The flagship bench (bench.py) covers the Harris/BriskFeature pipeline;
this measures the classic AGAST path batched over frames (vmapped
detect_ast_keypoints, emulated cache model — the TPU-speed
configuration; the exact sequential model is the CPU parity mode).

Honest checksum timing (device reduction + single readback).

  python tools/bench_ast.py [batch] [iters] [octaves] [threshold]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REF_DATA = "/root/reference/brisk/src/test/test_data"


def frames_4x(batch, h, w):
    paths = [os.path.join(REF_DATA, f"img{i}.pgm") for i in (1, 2)]
    if all(os.path.exists(p) for p in paths):
        from ethzasl_brisk_tpu.core.image_io import read_pgm

        crops = []
        for p in paths:
            im = np.asarray(read_pgm(p))
            crops.append(im[:h, :w])
            crops.append(im[-h:, -w:])
        return np.stack([crops[i % 4] for i in range(batch)])
    rng = np.random.default_rng(3)
    from scipy import ndimage

    base = rng.integers(0, 256, (batch, h, w)).astype(np.float32)
    sm = ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0, mode="nearest")
    return np.clip(sm, 0, 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.ast_scale_space import (
        detect_ast_keypoints,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    octaves = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    thr = int(sys.argv[4]) if len(sys.argv) > 4 else 70
    h, w = 480, 640

    print(f"device: {jax.devices()[0]}", flush=True)
    frames = jnp.asarray(frames_4x(batch, h, w))

    fn = jax.jit(
        jax.vmap(
            lambda im: detect_ast_keypoints(
                im, threshold=thr, octaves=octaves
            )
        )
    )
    for _ in range(3):
        kps = fn(frames)
        _ = int(np.asarray(jnp.sum(kps.valid)))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        kps = fn(frames)
        acc = acc + jnp.sum(kps.valid)
    total = int(np.asarray(acc))
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(
        f"AST detect batch={batch} octaves={octaves} thr={thr}: "
        f"{fps:.1f} frames/s ({dt/iters*1e3:.1f} ms/batch), "
        f"keypoints/frame ~{total/(batch*iters):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
