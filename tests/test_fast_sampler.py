"""Patch-sampler and batched-describe exactness.

The MXU one-hot patch sampler (describe/fast_sampler.py) and the flat
stacked-frame batch path (describe/extractor.extract_descriptors_batch)
must be BIT-identical to the reference-exact gather path
(SmoothedIntensity, brisk-descriptor-extractor.cc:370-530) — these are
performance backends, not approximations.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ethzasl_brisk_tpu.core.keypoints import KeyPoints
from ethzasl_brisk_tpu.core.pattern import brisk_v2_pattern
from ethzasl_brisk_tpu.describe.extractor import (
    DevicePattern,
    extract_descriptors,
    extract_descriptors_batch,
)

H, W = 240, 320
PATCH = dict(patch_h=128, patch_w=128)


@pytest.fixture(scope="module")
def pat():
    return DevicePattern.from_host(brisk_v2_pattern())


def _random_keypoints(rng, k, h=H, w=W):
    # Sizes spanning the detector's octave range; positions include
    # near-border ones (border filtering itself is under test too).
    size = rng.choice([8.4, 12.0, 16.8, 24.0, 33.6], size=k).astype(
        np.float32
    )
    return KeyPoints(
        x=jnp.asarray(rng.uniform(2, w - 2, k).astype(np.float32)),
        y=jnp.asarray(rng.uniform(2, h - 2, k).astype(np.float32)),
        size=jnp.asarray(size),
        angle=jnp.full((k,), -1.0, jnp.float32),
        response=jnp.zeros((k,), jnp.float32),
        octave=jnp.zeros((k,), jnp.int32),
        valid=jnp.ones((k,), bool),
    )


def test_patch_sampler_bit_exact(pat):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    kps = _random_keypoints(rng, 257)

    kp_g, d_g = extract_descriptors(pat, img, kps, sampler="gather")
    kp_p, d_p = extract_descriptors(pat, img, kps, sampler="patch", **PATCH)

    valid = np.asarray(kp_g.valid)
    assert valid.sum() > 120  # the comparison must not be vacuous
    np.testing.assert_array_equal(valid, np.asarray(kp_p.valid))
    # Angles/descriptors only matter on valid slots (invalid ones sample
    # out of bounds, where clamping behavior legitimately differs).
    np.testing.assert_array_equal(
        np.asarray(kp_g.angle)[valid], np.asarray(kp_p.angle)[valid]
    )
    np.testing.assert_array_equal(
        np.asarray(d_g)[valid], np.asarray(d_p)[valid]
    )


def test_patch_ms_sampler_bit_exact(pat):
    """Multi-size bucket sampler == gather, bit for bit (the bucket
    assignment must not change any tap value)."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    kps = _random_keypoints(rng, 257)

    kp_g, d_g = extract_descriptors(pat, img, kps, sampler="gather")
    kp_m, d_m = extract_descriptors(
        pat, img, kps, sampler="patch_ms", **PATCH
    )

    valid = np.asarray(kp_g.valid)
    assert valid.sum() > 120
    np.testing.assert_array_equal(valid, np.asarray(kp_m.valid))
    np.testing.assert_array_equal(
        np.asarray(kp_g.angle)[valid], np.asarray(kp_m.angle)[valid]
    )
    np.testing.assert_array_equal(
        np.asarray(d_g)[valid], np.asarray(d_m)[valid]
    )


@pytest.mark.parametrize("sampler", ["gather", "patch", "patch_ms"])
def test_batch_describe_matches_per_frame(pat, sampler):
    rng = np.random.default_rng(1)
    b, k = 4, 97
    imgs = jnp.asarray(rng.integers(0, 256, (b, H, W), dtype=np.uint8))

    frames = [_random_keypoints(rng, k) for _ in range(b)]
    # Frame boundaries are where the stacked layout can go wrong (patch
    # anchors must not straddle frames): pin keypoints against the
    # valid-border limit at the top and bottom of each frame.
    for i, f in enumerate(frames):
        y = np.asarray(f.y).copy()
        y[:8] = np.linspace(17.0, 40.0, 8)          # near top edge
        y[8:16] = np.linspace(H - 40.0, H - 17.5, 8)  # near bottom edge
        frames[i] = dataclasses.replace(f, y=jnp.asarray(y))

    batched = KeyPoints(
        **{
            fld.name: jnp.stack(
                [getattr(f, fld.name) for f in frames]
            )
            for fld in dataclasses.fields(KeyPoints)
        }
    )

    kw = dict(sampler=sampler, **(PATCH if sampler.startswith("patch") else {}))
    kp_b, d_b = extract_descriptors_batch(pat, imgs, batched, **kw)

    for i in range(b):
        kp_1, d_1 = extract_descriptors(pat, imgs[i], frames[i], **kw)
        valid = np.asarray(kp_1.valid)
        assert valid.sum() > k // 3
        np.testing.assert_array_equal(
            valid, np.asarray(kp_b.valid[i]), err_msg=f"frame {i}"
        )
        np.testing.assert_array_equal(
            np.asarray(kp_1.angle)[valid],
            np.asarray(kp_b.angle[i])[valid],
            err_msg=f"frame {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(d_1)[valid],
            np.asarray(d_b[i])[valid],
            err_msg=f"frame {i}",
        )
