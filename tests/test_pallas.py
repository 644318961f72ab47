"""Pallas kernel bodies vs jnp twins, in interpreter mode (CPU).

On non-TPU backends the `*_fused` wrappers fall back to the jnp path,
so the Mosaic kernel bodies are only exercised here (interpret=True
runs the same kernel logic without Mosaic lowering).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ethzasl_brisk_tpu.kernels.harris import harris_score_i32  # noqa: E402
from ethzasl_brisk_tpu.kernels.nms import maxima2d_mask  # noqa: E402
from ethzasl_brisk_tpu.kernels.pallas_harris import (  # noqa: E402
    harris_score_i32_batch_pallas,
    harris_score_mask_batch_pallas,
)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    from scipy import ndimage

    base = rng.integers(0, 256, (3, 120, 200)).astype(np.float32)
    sm = ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0, mode="nearest")
    return jnp.asarray(np.clip(sm, 0, 255).astype(np.uint8))


def test_pallas_harris_bit_exact(frames):
    ref = jax.vmap(harris_score_i32)(frames)
    got = harris_score_i32_batch_pallas(frames, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("thr", [20, 300])
def test_pallas_harris_mask_bit_exact(frames, thr):
    sc_ref = jax.vmap(harris_score_i32)(frames)
    mask_ref = jax.vmap(lambda s: maxima2d_mask(s, thr))(sc_ref)
    sc, mask = harris_score_mask_batch_pallas(
        frames, thr=thr, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sc_ref), np.asarray(sc))
    np.testing.assert_array_equal(np.asarray(mask_ref), np.asarray(mask))
    assert int(np.asarray(mask).sum()) > 0  # non-vacuous


def test_pallas_harris_nondivisible_width(frames):
    # 200 is not a multiple of 128: exercises the lane padding path.
    crop = frames[:, :, :190]
    ref = jax.vmap(harris_score_i32)(crop)
    got = harris_score_i32_batch_pallas(crop, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
