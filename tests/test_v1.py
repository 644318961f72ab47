"""BRISK v1 legacy engine (brisk-v1.cc) — structural tests.

No golden sets ship upstream for v1 (test-binary-equal.cc covers only
the v2 pipelines), so these tests validate structure and the documented
v1-vs-v2 semantic differences: no adaptive threshold map
(brisk-v1.cc:1685-1696), no scale-axis weak/edge gates (:1012-1110),
drop threshold = center (:1113+), same pyramid geometry (:577-593) and
the v1 ring pattern descriptor.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ethzasl_brisk_tpu.detect.ast_scale_space import (  # noqa: E402
    detect_ast_keypoints,
)
from ethzasl_brisk_tpu.pipeline import BriskFeatureDetector  # noqa: E402

from .conftest import TEST_DATA  # noqa: E402


@pytest.fixture(scope="module")
def image():
    from ethzasl_brisk_tpu.core.image_io import read_pgm

    p = TEST_DATA / "img1.pgm"
    if not p.exists():
        pytest.skip("reference test data unavailable")
    # Central crop keeps the per-test compile+run cost CI-affordable
    # while preserving natural-image statistics.
    return jnp.asarray(read_pgm(str(p)))[100:436, 150:598]


@pytest.fixture(scope="module")
def v1_kps(image):
    return detect_ast_keypoints(image, threshold=70, octaves=3, v1=True)


def test_v1_detect_structure(image, v1_kps):
    kps = v1_kps
    m = np.asarray(kps.valid)
    assert m.sum() > 100
    size = np.asarray(kps.size)[m]
    resp = np.asarray(kps.response)[m]
    x = np.asarray(kps.x)[m]
    y = np.asarray(kps.y)[m]
    h, w = image.shape
    assert (size >= 0.7 * 12.0).all() and (size <= 6 * 1.5 * 12.0).all()
    assert (resp > 0).all()
    assert (x >= 0).all() and (x < w).all()
    assert (y >= 0).all() and (y < h).all()


def test_v1_supersets_v2_accepts(image, v1_kps):
    """v1 drops the weak/edge discard gates and the adaptive threshold
    map raises effective thresholds on low-contrast regions — v1 finds
    strictly more keypoints at the same nominal threshold."""
    k2 = detect_ast_keypoints(image, threshold=70, octaves=3)
    assert (
        int(np.asarray(v1_kps.valid).sum())
        > int(np.asarray(k2.valid).sum())
    )


def test_v1_facade_end_to_end(image):
    det = BriskFeatureDetector(threshold=70, octaves=3, version="v1")
    kps, desc = det.detect_and_compute(image)
    m = np.asarray(kps.valid)
    assert m.sum() > 100
    d = np.asarray(desc)[m].view(np.uint8)
    # v1 ring pattern produces non-degenerate descriptors.
    bits = np.unpackbits(d, axis=1)
    pop = bits.sum(axis=1)
    # Non-degenerate: most descriptors have a real mix of 0/1 bits.
    frac = pop / bits.shape[1]
    assert ((frac > 0.05) & (frac < 0.95)).mean() > 0.9
    assert np.unique(d, axis=0).shape[0] > 0.5 * m.sum()


def test_v1_determinism(image, v1_kps):
    b = detect_ast_keypoints(image, threshold=70, octaves=3, v1=True)
    for f in ("x", "y", "size", "response", "valid"):
        assert np.array_equal(np.asarray(getattr(v1_kps, f)),
                              np.asarray(getattr(b, f)))
