"""Discriminate the reference's angle float-promotion chain against the
goldens.

brisk-descriptor-extractor.cc:732 calls unqualified
``atan2(static_cast<float>(d1), static_cast<float>(d0))``; with <cmath>
overloads visible that is libm atan2f (float), without them the args
promote to double.  This probe captures the integer direction sums (d0,
d1) for every golden keypoint and compares BOTH candidate chains against
the golden angle field bit-for-bit.

Usage: python tools/probe_angle.py
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_parity")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]

import jax.numpy as jnp  # noqa: E402

from ethzasl_brisk_tpu.core.golden import read_set  # noqa: E402
from ethzasl_brisk_tpu.describe import extractor as ext  # noqa: E402
from ethzasl_brisk_tpu.pipeline import BriskFeature  # noqa: E402

SET_DIR = "/root/reference/brisk/src/test/test_data"


def candidates(d0, d1):
    d0f = d0.astype(np.float32)
    d1f = d1.astype(np.float32)
    # A: atan2f (float overload), then double /pi*180, round once to f32
    a = (
        np.arctan2(d1f, d0f).astype(np.float64) / np.pi * 180.0
    ).astype(np.float32)
    # B: double atan2 of promoted args
    b = (
        np.arctan2(d1f.astype(np.float64), d0f.astype(np.float64))
        / np.pi
        * 180.0
    ).astype(np.float32)
    # C: all-f32 chain (current jit path, numpy flavor)
    c = (
        np.arctan2(d1f, d0f) / np.float32(np.pi) * np.float32(180.0)
    ).astype(np.float32)
    return {"atan2f+f64scale": a, "f64atan2": b, "allf32": c}


def main():
    entries = read_set(os.path.join(SET_DIR, "brisk_verification_harris.set"))
    feature = BriskFeature(
        octaves=0,
        uniformity_radius=30.0,
        absolute_threshold=20.0,
        max_candidates=16384,
        max_keypoints=16384,
        refine_dtype="float64",
        eager_exact=True,
        angle_exact=True,
    )
    for e in entries:
        ext._ANGLE_DEBUG_SINK = sink = []
        kps, desc = feature.detect_and_compute(jnp.asarray(e.image))
        ext._ANGLE_DEBUG_SINK = None
        assert len(sink) == 1, len(sink)
        d0, d1 = sink[0]
        m = np.asarray(kps.valid)
        got_xy = np.stack([np.asarray(kps.x)[m], np.asarray(kps.y)[m]], 1)
        got_angle = np.asarray(kps.angle)[m]
        d0, d1 = d0[m], d1[m]
        want = e.keypoint_array()
        # align by exact xy (parity is bit-exact on xy)
        from scipy.spatial import cKDTree

        tree = cKDTree(want[:, :2])
        dist, j = tree.query(got_xy, distance_upper_bound=1e-9)
        ok = np.isfinite(dist)
        wa = want[j[ok], 3].astype(np.float32)
        print(f"--- {e.path}: aligned {ok.sum()}/{len(want)}")
        for name, cand in candidates(d0[ok], d1[ok]).items():
            eq = (cand == wa) | (np.isclose(cand, wa) & (wa == 180.0))
            print(f"  {name}: bit-eq {(cand == wa).sum()}/{len(wa)}")
        eq = got_angle[ok] == wa
        print(f"  pipeline(angle_exact): bit-eq {eq.sum()}/{len(wa)}")
        if not eq.all():
            bad = np.flatnonzero(~eq)[:5]
            for i in bad:
                print(
                    f"    got {got_angle[ok][i]!r} want {wa[i]!r} "
                    f"d0={d0[ok][i]} d1={d1[ok][i]}"
                )


if __name__ == "__main__":
    main()
