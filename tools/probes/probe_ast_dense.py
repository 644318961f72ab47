"""Dense-vs-candidate AST detect on the REAL TPU: bitwise comparison +
stage timing on the bench frames.

CPU x64 equality is pinned by tests/test_ast_dense.py; without x64 the
two jit graphs can FMA-contract differently (XLA:CPU), flipping
integer-boundary truncations in the scan bilinears. This probe answers
the same question for the TPU backend and times both implementations.

Usage: python tools/probes/probe_ast_dense.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import bench_frames
    from ethzasl_brisk_tpu.detect.ast_dense import (
        detect_ast_keypoints_dense,
    )
    from ethzasl_brisk_tpu.detect.ast_scale_space import (
        detect_ast_keypoints,
    )
    from tools.tpu_timing import burn_in

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    frames = jnp.asarray(bench_frames(batch))
    kw = dict(
        threshold=70, octaves=3,
        max_candidates_per_layer=(768, 576, 512, 256, 128, 64),
    )

    cand = jax.jit(jax.vmap(
        lambda im: detect_ast_keypoints(
            im, raw_cache_model="emulated", **kw
        )
    ))
    dense = jax.jit(jax.vmap(
        lambda im: detect_ast_keypoints_dense(im, **kw)
    ))

    burn_in()
    kp_c = cand(frames)
    kp_d = dense(frames)
    ok = True
    for f in ("valid", "octave", "x", "y", "size", "response"):
        a, b = np.asarray(getattr(kp_c, f)), np.asarray(getattr(kp_d, f))
        n = int((a != b).sum())
        if n:
            ok = False
            # Restrict to valid slots for severity.
            v = np.asarray(kp_c.valid) | np.asarray(kp_d.valid)
            nv = int((a != b)[v].sum()) if a.shape == v.shape else n
            print(f"  {f}: {n} mismatches ({nv} on valid slots)")
    print("TPU dense==candidates:", "BITWISE OK" if ok else "MISMATCH")

    def timed(fn, name, reps=4):
        for _ in range(3):
            kp = fn(frames)
            float(np.asarray(jnp.sum(kp.response)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            kp = fn(frames)
            acc = acc + jnp.sum(kp.response)
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name}: {dt*1e3:.1f} ms/batch{batch}")

    timed(cand, "candidates")
    timed(dense, "dense")


if __name__ == "__main__":
    main()
