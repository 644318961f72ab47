"""Standing TPU-side parity gate: the jitted TPU pipeline must produce
BIT-IDENTICAL detections + descriptors to the jitted CPU pipeline on the
reference's golden images.

Closes the "golden parity is eager-CPU-only" hole: tools/parity.py gates
the eager CPU path against the reference goldens; this gate pins the
jitted TPU path to the jitted CPU path (same program, both backends), so
TPU output is golden-anchored transitively up to the documented jit
FMA-contraction ULP class — which this check asserts is EMPTY between
the two backends for detection ints, refined floats and descriptor bits.

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

    outs = {}
    for name, dev in (("cpu", cpu_dev), ("tpu", tpu_dev)):
        img = jax.device_put(jnp.asarray(img_np), dev)
        pat = jax.device_put(feature.extractor.pattern, dev)
        kps = feature._detect_jit(img)
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
    import dataclasses

    for f in dataclasses.fields(kc):
        a, b = getattr(kc, f.name), getattr(kt, f.name)
        eq = np.array_equal(a, b)
        ok &= eq
        if not eq:
            bad = np.flatnonzero(
                a != b if a.dtype != np.float32 else a.view(np.int32)
                != b.view(np.int32)
            )
            print(f"  MISMATCH {f.name}: {len(bad)} entries, first "
                  f"{bad[:5]} cpu={a.flat[bad[:3]]} tpu={b.flat[bad[:3]]}")
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
