"""End-to-end throughput benchmark: detect+describe+match at 640x480.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline: the north-star target of 5000 frames/s/chip (BASELINE.json);
the reference repo publishes no numbers of its own (SURVEY.md section 6).
"""
from __future__ import annotations

import json
import time

import numpy as np

TARGET_FPS = 5000.0
H, W = 480, 640


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.parallel import FramePipeline, make_mesh
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    batch = int(__import__("os").environ.get("BENCH_BATCH", "16"))
    iters = int(__import__("os").environ.get("BENCH_ITERS", "20"))

    feature = BriskFeature(
        octaves=2,
        uniformity_radius=0.0,
        absolute_threshold=30.0,
        max_candidates=512,
        max_keypoints=512,
        sampler="gather",
    )
    mesh = make_mesh(1, 1)
    pipe = FramePipeline(feature=feature, mesh=mesh)
    # NOTE: pipe.step is internally jitted with the pattern tables as
    # runtime args; wrapping it in another jit would re-capture them as
    # closure constants (~2000x slower on TPU).
    step = pipe.step

    rng = np.random.default_rng(7)
    # Natural-image-like input: smoothed noise so detection does real work.
    base = rng.integers(0, 256, (batch, H, W)).astype(np.float32)
    k = np.ones((1, 5, 5)) / 25.0
    from scipy import ndimage  # in the base image; gate if absent

    frames_np = ndimage.convolve(base, k, mode="nearest")
    frames = jnp.asarray(
        np.clip(frames_np, 0, 255).astype(np.uint8)
    )

    with mesh:
        # NOTE: on the tunneled backend, block_until_ready does NOT force
        # execution (it defers to host readback). A device-side checksum
        # chained across iterations + one final readback measures honestly:
        # total = iters * compute + one RPC round trip.
        # Compile + warm-up with forced readback; two rounds because the
        # first post-compile execution through the tunnel can be 2-3x
        # slower than steady state.
        for _ in range(2):
            out = step(frames)
            _ = float(jnp.sum(out[3]))

        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(iters):
            out = step(frames)
            acc = acc + jnp.sum(out[3])
        checksum = int(np.asarray(acc))  # forces the whole chain
        dt = time.perf_counter() - t0
        assert checksum != 0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "frames_per_s_per_chip_640x480_detect_describe_match",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
