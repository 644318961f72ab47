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


class TestDescribeCompact:
    """extract_descriptors_compact == extract_descriptors_batch bitwise
    for every described keypoint, with overflow dropped (valid=False)."""

    def _batch(self, b=3, k=40, seed=5):
        import jax
        import jax.numpy as jnp
        from scipy import ndimage

        from ethzasl_brisk_tpu.core.keypoints import KeyPoints

        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (b, 120, 160)).astype(np.float32)
        imgs = np.clip(
            ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0,
                             mode="nearest"), 0, 255
        ).astype(np.uint8)
        x = rng.uniform(25, 135, (b, k)).astype(np.float32)
        y = rng.uniform(25, 95, (b, k)).astype(np.float32)
        valid = rng.random((b, k)) < 0.5
        kps = KeyPoints(
            x=jnp.asarray(x), y=jnp.asarray(y),
            size=jnp.full((b, k), 12.0, jnp.float32),
            angle=jnp.full((b, k), -1.0, jnp.float32),
            response=jnp.asarray(rng.uniform(1, 9, (b, k)), ),
            octave=jnp.zeros((b, k), jnp.int32),
            valid=jnp.asarray(valid),
        )
        return jnp.asarray(imgs), kps

    def test_compact_matches_batch(self):
        import numpy as np

        from ethzasl_brisk_tpu.describe.extractor import (
            BriskExtractor,
            extract_descriptors_batch,
            extract_descriptors_compact,
        )

        imgs, kps = self._batch()
        ext = BriskExtractor()
        pat = ext.pattern
        ref_kp, ref_desc = extract_descriptors_batch(
            pat, imgs, kps, skip_small=ext.skip_small
        )
        got_kp, got_desc = extract_descriptors_compact(
            pat, imgs, kps, capacity=kps.x.size,
            skip_small=ext.skip_small,
        )
        np.testing.assert_array_equal(
            np.asarray(got_kp.valid), np.asarray(ref_kp.valid)
        )
        m = np.asarray(ref_kp.valid)
        np.testing.assert_array_equal(
            np.asarray(got_desc)[m], np.asarray(ref_desc)[m]
        )
        np.testing.assert_array_equal(
            np.asarray(got_kp.angle)[m], np.asarray(ref_kp.angle)[m]
        )

    def test_compact_overflow_drops(self):
        import numpy as np

        from ethzasl_brisk_tpu.describe.extractor import (
            BriskExtractor,
            extract_descriptors_batch,
            extract_descriptors_compact,
        )

        imgs, kps = self._batch()
        ext = BriskExtractor()
        pat = ext.pattern
        cap = 30  # fewer than the number of valid inputs
        ref_kp, ref_desc = extract_descriptors_batch(
            pat, imgs, kps, skip_small=ext.skip_small
        )
        got_kp, got_desc = extract_descriptors_compact(
            pat, imgs, kps, capacity=cap, skip_small=ext.skip_small,
        )
        gv = np.asarray(got_kp.valid)
        assert gv.sum() <= cap
        # Every surviving keypoint is bitwise identical to the batch path.
        m = gv
        np.testing.assert_array_equal(
            np.asarray(got_desc)[m], np.asarray(ref_desc)[m]
        )
        # Non-described slots keep their input coordinates.
        drop = np.asarray(kps.valid) & ~gv
        np.testing.assert_array_equal(
            np.asarray(got_kp.x)[drop], np.asarray(kps.x)[drop]
        )


class TestPallasSampler:
    """Fused Pallas patch sampler == patch_ms bitwise (interpret mode on
    CPU; validated on real TPU hardware too — NOTES round 3)."""

    def test_pallas_sampler_matches_patch_ms(self):
        import jax
        import jax.numpy as jnp
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

        rng = np.random.default_rng(9)
        B, H, W = 2, 160, 200
        base = rng.integers(0, 256, (B, H, W)).astype(np.float32)
        imgs = jnp.asarray(
            np.clip(
                ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0,
                                 mode="nearest"), 0, 255
            ).astype(np.uint8)
        )
        img_pad, int_flat = _stack_frames(imgs)
        K = 24
        kx = jnp.asarray(
            rng.uniform(30, 170, (B, K)).astype(np.float32)
        ).reshape(-1)
        ky = jnp.asarray(
            rng.uniform(30, 130, (B, K)).astype(np.float32)
        ).reshape(-1)
        sizes = jnp.asarray(
            rng.choice([12.0, 18.0, 24.0, 40.0], (B * K,))
            .astype(np.float32)
        )
        row_base = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * (H + 1), K)
        pat = DevicePattern.from_host(brisk_v2_pattern(1.0))
        sidx = scale_index(sizes, True)
        args = (
            img_pad, int_flat, kx, ky,
            pat.lut_x[sidx, 0], pat.lut_y[sidx, 0], pat.lut_sigma[sidx],
            pat.lut_scaling[sidx], pat.lut_scaling2[sidx],
        )
        cfg = ((32, 128), (64, 128), (128, 128))
        ref = smoothed_intensity_patch_ms(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
        )
        got = smoothed_intensity_patch_pallas(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_pallas_sampler_big_bucket_over_2pow24(self):
        """AST-size (256,256) bucket: window anchored values exceed 2^24
        on bright images — exercises the 4-limb split-accumulator path
        (3 bf16 limbs silently drop bit 24 there; ADVICE round 3)."""
        import jax.numpy as jnp

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

        rng = np.random.default_rng(11)
        H, W = 320, 420
        # Bright image: anchored integral values in the 264x384 window
        # reach ~ r*c*250 > 2^24 for bottom-right taps.
        img = (255 - rng.integers(0, 8, (1, H, W))).astype(np.uint8)
        imgs = jnp.asarray(img)
        img_pad, int_flat = _stack_frames(imgs)
        K = 16
        # Keypoints toward the bottom-right so taps land at high window
        # coordinates; large sizes so only the catch-all bucket fits.
        kx = jnp.asarray(rng.uniform(250, 360, (K,)).astype(np.float32))
        ky = jnp.asarray(rng.uniform(200, 260, (K,)).astype(np.float32))
        sizes = jnp.asarray(
            rng.choice([96.0, 128.0], (K,)).astype(np.float32)
        )
        row_base = jnp.zeros((K,), jnp.int32)
        pat = DevicePattern.from_host(brisk_v2_pattern(1.0))
        sidx = scale_index(sizes, True)
        args = (
            img_pad, int_flat, kx, ky,
            pat.lut_x[sidx, 0], pat.lut_y[sidx, 0], pat.lut_sigma[sidx],
            pat.lut_scaling[sidx], pat.lut_scaling2[sidx],
        )
        cfg = ((64, 128), (256, 256))
        ref = smoothed_intensity_patch_ms(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
        )
        got = smoothed_intensity_patch_pallas(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestBorderAwareCompaction:
    """Capacity budget counts DESCRIBABLE keypoints only: valid
    keypoints outside the pattern border (which describe invalidates
    regardless) must not consume compaction slots. Regression for the
    silent whole-frame drop when capacity covered the describable
    population but compaction still spent slots on border rejects
    (bench keypoints/frame min=0, 2026-08-20)."""

    def test_capacity_counts_describable_only(self):
        import jax.numpy as jnp

        from ethzasl_brisk_tpu.core.keypoints import KeyPoints
        from ethzasl_brisk_tpu.describe.extractor import (
            BriskExtractor,
            extract_descriptors_batch,
            extract_descriptors_compact,
        )
        from scipy import ndimage

        rng = np.random.default_rng(7)
        b, k = 3, 48
        base = rng.integers(0, 256, (b, 120, 160)).astype(np.float32)
        imgs = np.clip(
            ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0,
                             mode="nearest"), 0, 255
        ).astype(np.uint8)
        # Half the keypoints sit INSIDE the border margin, half within
        # a few px of the edge (outside the ~23 px pattern border for
        # size 12): all are detect-valid, only the inner ones are
        # describable.
        x = np.where(
            np.arange(k)[None, :] % 2 == 0,
            rng.uniform(30, 130, (b, k)),
            rng.uniform(1, 8, (b, k)),
        ).astype(np.float32)
        y = rng.uniform(30, 90, (b, k)).astype(np.float32)
        kps = KeyPoints(
            x=jnp.asarray(x), y=jnp.asarray(y),
            size=jnp.full((b, k), 12.0, jnp.float32),
            angle=jnp.full((b, k), -1.0, jnp.float32),
            response=jnp.asarray(
                rng.uniform(1, 9, (b, k)).astype(np.float32)
            ),
            octave=jnp.zeros((b, k), jnp.int32),
            valid=jnp.ones((b, k), bool),
        )
        ext = BriskExtractor()
        pat = ext.pattern
        ref_kp, ref_desc = extract_descriptors_batch(
            pat, jnp.asarray(imgs), kps, skip_small=ext.skip_small
        )
        n_desc = int(np.asarray(ref_kp.valid).sum())
        assert 0 < n_desc < b * k // 2 + b  # border half rejected
        # Capacity = exactly the describable count: every described
        # keypoint must survive even though detect-valid count (b*k)
        # far exceeds it.
        got_kp, got_desc = extract_descriptors_compact(
            pat, jnp.asarray(imgs), kps, capacity=n_desc,
            skip_small=ext.skip_small,
        )
        np.testing.assert_array_equal(
            np.asarray(got_kp.valid), np.asarray(ref_kp.valid)
        )
        m = np.asarray(ref_kp.valid)
        np.testing.assert_array_equal(
            np.asarray(got_desc)[m], np.asarray(ref_desc)[m]
        )
