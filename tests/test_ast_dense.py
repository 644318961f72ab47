"""Dense AST detect (ast_dense.py) == candidate path, bitwise.

The dense rewrite recomputes every IsMax2D / Refine3D / scan decision
over full maps; these tests pin bitwise equality of the final packed
KeyPoints against detect_ast_keypoints(raw_cache_model="emulated") on
the reference's own images.

All comparisons run under x64: without it, ``_fmul`` degrades to a
plain (contractible) f32 multiply and XLA:CPU's LLVM backend FMA-
contracts the two jit graphs DIFFERENTLY, flipping integer-boundary
truncations in the scan bilinears (observed: scan scores off by
exactly 1 on ~10/2048 candidates). Under x64 the products round once
in f64 and both graphs are deterministic. The TPU backend comparison
(no LLVM, deterministic emitters) lives in
tools/probes/probe_ast_dense.py.
"""
import numpy as np
import pytest

FIELDS = ("valid", "octave", "x", "y", "size", "response", "angle")


def _compare(img, **kw):
    import jax

    from ethzasl_brisk_tpu.detect.ast_dense import (
        detect_ast_keypoints_dense,
    )
    from ethzasl_brisk_tpu.detect.ast_scale_space import (
        detect_ast_keypoints,
    )

    with jax.enable_x64(True):
        kp_c = jax.jit(
            lambda im: detect_ast_keypoints(
                im, raw_cache_model="emulated", **kw
            )
        )(img)
        kp_d = jax.jit(
            lambda im: detect_ast_keypoints_dense(im, **kw)
        )(img)
        for f in FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(kp_c, f)),
                np.asarray(getattr(kp_d, f)),
                err_msg=f"dense {f} mismatch",
            )
        return int(np.asarray(kp_c.valid).sum())


@pytest.mark.quick
def test_dense_equals_candidates_crop(img1):
    import jax.numpy as jnp

    crop = jnp.asarray(np.asarray(img1)[:240, :320])
    n = _compare(
        crop, threshold=70, octaves=3, max_candidates_per_layer=2048
    )
    assert n > 30


@pytest.mark.quick
def test_dense_equals_candidates_octave1(img1):
    import jax.numpy as jnp

    crop = jnp.asarray(np.asarray(img1)[100:340, 200:520])
    n = _compare(
        crop, threshold=50, octaves=1, max_candidates_per_layer=2048
    )
    assert n > 30


@pytest.mark.slow
def test_dense_equals_candidates_full_image(img1):
    import jax.numpy as jnp

    n = _compare(
        jnp.asarray(np.asarray(img1)),
        threshold=70, octaves=3, max_candidates_per_layer=2048,
    )
    assert n > 300


@pytest.mark.slow
def test_dense_equals_candidates_img2_thr30(img2):
    import jax.numpy as jnp

    crop = jnp.asarray(np.asarray(img2)[:320, :448])
    n = _compare(
        crop, threshold=30, octaves=2, max_candidates_per_layer=4096
    )
    assert n > 100


@pytest.mark.slow
def test_dense_equals_candidates_v1(img1):
    import jax.numpy as jnp

    crop = jnp.asarray(np.asarray(img1)[:240, :320])
    n = _compare(
        crop, threshold=70, octaves=3, max_candidates_per_layer=2048,
        v1=True,
    )
    assert n > 10


@pytest.mark.quick
def test_dense_facade_dispatch(img1):
    """BriskFeatureDetector(detect_impl='dense') routes to the dense
    engine and matches the candidate facade bitwise."""
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.pipeline import BriskFeatureDetector

    crop = jnp.asarray(np.asarray(img1)[:240, :320])
    det_c = BriskFeatureDetector(threshold=70, octaves=3,
                                 max_candidates_per_layer=1024)
    det_d = BriskFeatureDetector(threshold=70, octaves=3,
                                 max_candidates_per_layer=1024,
                                 detect_impl="dense")
    with jax.enable_x64(True):
        kp_c = jax.jit(det_c.detect)(crop)
        kp_d = jax.jit(det_d.detect)(crop)
        for f in FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(kp_c, f)),
                np.asarray(getattr(kp_d, f)),
            )
