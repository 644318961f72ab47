"""Bench matrix: end-to-end fps across perf-backend combinations.

Runs bench.py's pipeline in ONE process (shared compile cache, paced
compiles) across backend combos, printing fps for each. Used to flip
bench defaults by data (NOTES round-3 queue).

  python tools/bench_matrix.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import bench_frames
    from ethzasl_brisk_tpu.parallel import FramePipeline, make_mesh
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    print(f"device: {jax.devices()[0]}", flush=True)
    batch, iters = 16, 12
    frames = jnp.asarray(bench_frames(batch))
    mesh = make_mesh(1, 1)

    # 2026-08-19 measurements (this tool): base 51.2 fps, patch_ms 68.9,
    # select-topk 45.2 (net loss end-to-end — sort stays default).
    combos = [
        ("base (patch/sort)", dict()),
        ("patch_ms", dict(sampler="patch_ms")),
        ("patch_ms+fused", dict(sampler="patch_ms", fused_mask=True)),
    ]

    results = {}
    ref_out = None
    for name, kw in combos:
        feature = BriskFeature(
            octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
            max_candidates=8192, max_keypoints=1024,
            sampler=kw.get("sampler", "patch"),
            patch_h=128, patch_w=128,
            topk_impl=kw.get("topk_impl", "sort"),
            fused_mask=kw.get("fused_mask", False),
        )
        pipe = FramePipeline(feature=feature, mesh=mesh)
        step = pipe.step
        with mesh:
            for _ in range(4):
                out = step(frames)
                float(np.asarray(jnp.sum(out[3])))
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.int32)
            for _ in range(iters):
                out = step(frames)
                acc = acc + jnp.sum(out[3])
            int(np.asarray(acc))
            dt = time.perf_counter() - t0
        fps = batch * iters / dt
        results[name] = fps
        # Cross-combo bitwise equality on descriptors + keypoints.
        if ref_out is None:
            ref_out = out
            eq = "ref"
        else:
            eq = bool(
                jnp.all(out[3] == ref_out[3])
                & jnp.all(out[0].x == ref_out[0].x)
                & jnp.all(out[0].y == ref_out[0].y)
                & jnp.all(out[0].valid == ref_out[0].valid)
            )
        print(f"  {name:20s} {fps:7.1f} fps   bit-equal: {eq}", flush=True)

    base = results["base (patch/sort)"]
    for name, fps in results.items():
        print(f"  {name:20s} {fps/base:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
