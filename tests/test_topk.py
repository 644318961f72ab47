"""Sort-free exact top-k (kernels/topk.py) == lax.top_k, bitwise."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ethzasl_brisk_tpu.detect.scale_space import (  # noqa: E402
    DetectorConfig,
    detect_keypoints,
)
from ethzasl_brisk_tpu.kernels.topk import INT32_MIN, topk_int32  # noqa: E402


@pytest.mark.parametrize("kind", ["uniform", "ties", "sparse", "const"])
def test_topk_matches_lax(kind):
    seeds = {"uniform": 101, "ties": 202, "sparse": 303, "const": 404}
    rng = np.random.default_rng(seeds[kind])
    n, k = 200_000, 4096
    if kind == "uniform":
        x = rng.integers(-2**31, 2**31 - 1, n, dtype=np.int64).astype(
            np.int32
        )
    elif kind == "ties":
        x = rng.integers(-4, 4, n).astype(np.int32)
    elif kind == "sparse":
        x = np.full(n, INT32_MIN, np.int32)
        m = rng.random(n) < 0.01
        x[m] = rng.integers(0, 500, m.sum()).astype(np.int32)
    else:
        x = np.full(n, 7, np.int32)
    xv = jnp.asarray(x)
    rv, ri = jax.lax.top_k(xv, k)
    tv, ti = jax.jit(lambda a: topk_int32(a, k))(xv)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(tv))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(ti))


def test_detect_with_select_topk_bitwise():
    from scipy import ndimage

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (240, 320)).astype(np.float32)
    sm = ndimage.convolve(base, np.ones((5, 5)) / 25.0, mode="nearest")
    img = jnp.asarray(np.clip(sm, 0, 255).astype(np.uint8))
    cfgs = [
        DetectorConfig(
            octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
            max_candidates=2048, max_keypoints=512, max_num_kpt=512,
            topk_impl=impl,
        )
        for impl in ("sort", "select")
    ]
    a = jax.jit(lambda im: detect_keypoints(im, cfgs[0]))(img)
    b = jax.jit(lambda im: detect_keypoints(im, cfgs[1]))(img)
    for f in ("x", "y", "size", "response", "octave", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
