"""Standing TPU-side parity gate: the jitted TPU pipeline must produce
BIT-IDENTICAL detections + descriptors to the jitted CPU pipeline on the
reference's golden images.

Closes the "golden parity is eager-CPU-only" hole: tools/parity.py gates
the eager CPU path against the reference goldens; this gate pins the
jitted TPU path to the jitted CPU path (same program, both backends).

Gate semantics (measured backend ULP classes, 2026-08-19):
* BIT-EQUAL required: valid mask, octave, size, response, and every
  DESCRIPTOR byte (these feed matching; they are integer- or
  quantization-protected).
* 1-ULP tails allowed and BOUNDED for refined x/y (backend-specific
  FMA contraction in the subpixel float chain, <=0.7%% of keypoints).
* angle: the two backends ship DIFFERENT f32 arctan2 approximations
  (divergence up to ~80 ULP ~= 6e-4 deg measured, ~40%% of keypoints
  nonzero); bounded by |diff| <= 2e-3 deg. Descriptors stay bit-equal
  regardless (the 1024-bin rotation quantization absorbs it) and THAT
  is asserted bitwise.

Run when the tunnel is up:  python tools/tpu_parity.py
Records PASS/FAIL per image; exits nonzero on any mismatch.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REF_DATA = "/root/reference/brisk/src/test/test_data"


def run_one(feature, img_np, cpu_dev, tpu_dev):
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.scale_space import detect_keypoints
    from ethzasl_brisk_tpu.kernels.harris import harris_score_i32

    outs = {}
    for name, dev in (("cpu", cpu_dev), ("tpu", tpu_dev)):
        img = jax.device_put(jnp.asarray(img_np), dev)
        pat = jax.device_put(feature.extractor.pattern, dev)
        # CPU leg: the Pallas Harris kernel is TPU-only; the jnp twin is
        # bit-exact (tests/test_pallas.py), so this gate additionally
        # pins Pallas-vs-jnp through the WHOLE pipeline.
        score_fn = None if dev.platform != "cpu" else harris_score_i32

        def det(im, score_fn=score_fn):
            return detect_keypoints(im, feature.config, score_fn)

        kps = jax.jit(det)(img)
        if kps.capacity > feature.max_keypoints:
            kps = kps.top_k(feature.max_keypoints)
        from ethzasl_brisk_tpu.describe.extractor import (
            extract_descriptors,
        )

        kps2, desc = extract_descriptors(
            pat, img, kps,
            rotation_invariant=feature.rotation_invariant,
            scale_invariant=feature.scale_invariant,
            sampler=feature.sampler,
            patch_h=feature.patch_h,
            patch_w=feature.patch_w,
            skip_small=feature.extractor.skip_small,
        )
        outs[name] = (
            jax.tree.map(np.asarray, kps2), np.asarray(desc)
        )
    kc, dc = outs["cpu"]
    kt, dt = outs["tpu"]
    ok = True

    def ulp_diff(a, b):
        ai = a.view(np.int32).astype(np.int64)
        bi = b.view(np.int32).astype(np.int64)
        # Monotone int mapping of IEEE floats (sign-magnitude -> biased).
        ai = np.where(ai < 0, -(2**31) - ai, ai)
        bi = np.where(bi < 0, -(2**31) - bi, bi)
        return np.abs(ai - bi)

    for f in ("valid", "octave", "size", "response"):
        a, b = getattr(kc, f), getattr(kt, f)
        eq = np.array_equal(a, b)
        ok &= eq
        if not eq:
            print(f"  MISMATCH {f}: {np.sum(a != b)} entries")
    n = kc.valid.sum()
    for f, bound in (("x", 0.007), ("y", 0.007)):
        a = getattr(kc, f)[kc.valid]
        b = getattr(kt, f)[kc.valid]
        d = ulp_diff(a, b)
        frac = float((d > 0).sum()) / max(int(n), 1)
        if d.max(initial=0) > 1 or frac > bound:
            ok = False
            print(f"  MISMATCH {f}: max ulp {d.max(initial=0)}, "
                  f"{100*frac:.2f}% differ (bound {100*bound}%)")
        elif d.max(initial=0):
            print(f"  {f}: {int((d > 0).sum())}/{int(n)} at 1 ULP "
                  f"(within bound)")
    da = np.abs(kc.angle[kc.valid] - kt.angle[kc.valid])
    da = np.minimum(da, 360.0 - da)
    if da.max(initial=0) > 2e-3:
        ok = False
        print(f"  MISMATCH angle: max |diff| {da.max():.2e} deg")
    elif da.max(initial=0):
        print(f"  angle: max |diff| {da.max():.2e} deg "
              f"({int((da > 0).sum())}/{int(n)} nonzero; backend atan2)")
    eq = np.array_equal(dc, dt)
    ok &= eq
    if not eq:
        rows = np.flatnonzero((dc != dt).any(axis=1))
        print(f"  MISMATCH descriptors: {len(rows)} rows")
    return ok


def main():
    import jax

    from ethzasl_brisk_tpu.core.image_io import read_pgm
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpu:
        print("NO TPU DEVICE — gate skipped")
        return 2
    cpu = jax.devices("cpu")[0]
    tpu = tpu[0]
    print(f"cpu={cpu} tpu={tpu}", flush=True)

    feature = BriskFeature(
        octaves=2,
        uniformity_radius=30.0,
        absolute_threshold=20.0,
        max_candidates=8192,
        max_keypoints=1024,
        max_num_kpt=1024,
        sampler="patch_ms",
        patch_h=128,
        patch_w=128,
    )
    all_ok = True
    for im in ("img1", "img2"):
        img = np.asarray(read_pgm(os.path.join(REF_DATA, f"{im}.pgm")))
        img = img[:480, :640]  # bench-standard crop
        ok = run_one(feature, img, cpu, tpu)
        print(f"{im}: {'BIT-IDENTICAL' if ok else 'MISMATCH'}",
              flush=True)
        all_ok &= ok
    print("TPU PARITY OK" if all_ok else "TPU PARITY FAILED")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
