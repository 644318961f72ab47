"""Diagnose the single-tap mismatch of the single-call Pallas sampler.

probe_sampler_v2 found 1/675840 values off by one on real TPU (interpret
mode clean). This isolates the failing keypoint: re-runs it alone, with
its group, with different group sizes, and prints its bucket geometry.

Run on TPU: python tools/probe_sampler_debug.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    print("devices", jax.devices(), flush=True)
    from scipy import ndimage

    from ethzasl_brisk_tpu.core.pattern import brisk_v2_pattern
    from ethzasl_brisk_tpu.describe.extractor import (
        DevicePattern,
        _stack_frames,
        scale_index,
    )
    from ethzasl_brisk_tpu.describe.fast_sampler import (
        smoothed_intensity_patch_ms,
    )
    from ethzasl_brisk_tpu.describe.pallas_sampler import (
        smoothed_intensity_patch_pallas,
    )

    rng = np.random.default_rng(3)
    B, H, W = 16, 480, 640
    K = 640
    base = rng.integers(0, 256, (B, H, W)).astype(np.float32)
    imgs = jnp.asarray(
        np.clip(
            ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0,
                             mode="nearest"), 0, 255
        ).astype(np.uint8)
    )
    img_pad, int_flat = _stack_frames(imgs)
    kx = np.asarray(rng.uniform(40, W - 40, (B * K,)).astype(np.float32))
    ky = np.asarray(rng.uniform(40, H - 40, (B * K,)).astype(np.float32))
    sizes = np.asarray(
        rng.choice(
            [12.0, 14.0, 18.0, 24.0, 40.0, 54.0], (B * K,),
            p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03],
        ).astype(np.float32)
    )
    row_base = np.repeat(np.arange(B, dtype=np.int32) * (H + 1), K)
    pat = DevicePattern.from_host(brisk_v2_pattern(1.0))
    cfg = ((32, 128), (64, 128), (128, 128))

    def run(sel_idx, sampler, **kw):
        sidx = scale_index(jnp.asarray(sizes[sel_idx]), True)
        return np.asarray(sampler(
            img_pad, int_flat,
            jnp.asarray(kx[sel_idx]), jnp.asarray(ky[sel_idx]),
            pat.lut_x[sidx, 0], pat.lut_y[sidx, 0], pat.lut_sigma[sidx],
            pat.lut_scaling[sidx], pat.lut_scaling2[sidx],
            patch_sizes=cfg, row_base=jnp.asarray(row_base[sel_idx]),
            frame_rows=H, **kw,
        ))

    all_idx = np.arange(B * K)
    ref = run(all_idx, smoothed_intensity_patch_ms)
    got = run(all_idx, smoothed_intensity_patch_pallas)
    bad = np.argwhere(ref != got)
    print(f"full run: {bad.shape[0]} mismatches", flush=True)
    if bad.shape[0] == 0:
        print("no repro this time -> nondeterministic (race?)")
        # run a few more times
        for trial in range(4):
            got = run(all_idx, smoothed_intensity_patch_pallas)
            bad = np.argwhere(ref != got)
            print(f"trial {trial}: {bad.shape[0]} mismatches", flush=True)
            if bad.shape[0]:
                break
    if bad.shape[0] == 0:
        return
    kstar = int(bad[0][0])
    print("first bad keypoint", kstar, "point", int(bad[0][1]),
          "ref", ref[tuple(bad[0])], "got", got[tuple(bad[0])])
    print("kx", kx[kstar], "ky", ky[kstar], "size", sizes[kstar],
          "row_base", row_base[kstar])
    print("n bad kpts:", len(np.unique(bad[:, 0])),
          "bad kpt list:", np.unique(bad[:, 0])[:10])

    # Re-run the bad keypoint ALONE (one group) and with small slices.
    for lo in (kstar, max(kstar - 7, 0), max(kstar - 63, 0)):
        sel = np.arange(lo, min(lo + 64, B * K))
        r2 = run(sel, smoothed_intensity_patch_ms)
        g2 = run(sel, smoothed_intensity_patch_pallas)
        b2 = np.argwhere(r2 != g2)
        print(f"slice [{lo}:{lo+64}]: {b2.shape[0]} mismatches", flush=True)

    # Determinism of the full run: same input twice.
    g3 = run(all_idx, smoothed_intensity_patch_pallas)
    print("full rerun equal to first pallas run:",
          bool((got == g3).all()), flush=True)


if __name__ == "__main__":
    main()
