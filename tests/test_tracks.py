"""End-to-end config-4 slice: detect -> match -> tracks -> triangulate ->
windowed BA on a synthetic scene with known geometry."""
import numpy as np
import pytest

from .test_vo import render_scene


@pytest.mark.slow
def test_tracks_to_ba():
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.ba import solve_window_ba
    from ethzasl_brisk_tpu.ba.window import _residual_and_jacobians
    from ethzasl_brisk_tpu.geometry import PinholeCamera
    from ethzasl_brisk_tpu.match.matcher import match_with_ratio_and_crosscheck
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from ethzasl_brisk_tpu.vo.tracks import build_ba_problem

    rng = np.random.default_rng(3)
    from scipy import ndimage

    tex = ndimage.gaussian_filter(rng.uniform(0, 255, (480, 640)), 2.0)
    tex = ((tex - tex.min()) / (np.ptp(tex) + 1e-9) * 255).astype(np.uint8)
    cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, 640, 480)

    n = 4
    poses_gt = []
    frames = []
    for i in range(n):
        a = 0.01 * i
        r = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
             [-np.sin(a), 0, np.cos(a)]]
        )
        t = np.array([0.1 * i, 0.01 * i, 0.0])
        poses_gt.append((r, t))
        frames.append(render_scene(tex, cam, r, t))

    feature = BriskFeature(
        octaves=1, uniformity_radius=0.0, absolute_threshold=40.0,
        max_candidates=512, max_keypoints=512,
    )
    kps, descs = [], []
    for f in frames:
        k, d = feature.detect_and_compute(jnp.asarray(f))
        kps.append(k)
        descs.append(d)

    pair_matches = []
    for i in range(1, n):
        best, matched = match_with_ratio_and_crosscheck(
            descs[i], descs[i - 1], kps[i].valid, kps[i - 1].valid,
            max_distance=80,
        )
        # tracks convention: frame i matches into frame i-1.
        pair_matches.append((np.asarray(best), np.asarray(matched)))

    keypoint_xy = [
        np.stack([np.asarray(k.x), np.asarray(k.y)], 1) for k in kps
    ]
    # Perturbed poses (except the first two, anchoring gauge+scale).
    poses_init = []
    for i, (r, t) in enumerate(poses_gt):
        if i < 2:
            poses_init.append((r, t))
        else:
            dw = rng.normal(0, 0.004, 3)
            from ethzasl_brisk_tpu.ba import so3_exp

            dr = np.asarray(so3_exp(jnp.asarray(dw[None], jnp.float32)))[0]
            poses_init.append((dr @ r, t + rng.normal(0, 0.02, 3)))

    prob = build_ba_problem(
        cam, poses_init, keypoint_xy, pair_matches,
        max_landmarks=1024, max_observations=4096,
    )
    n_obs = int(np.asarray(prob.valid).sum())
    assert n_obs > 300, n_obs

    res0, _, _, w0 = _residual_and_jacobians(prob)
    rms0 = float(np.sqrt(
        (np.asarray(res0) ** 2).sum(1)[np.asarray(w0) > 0].mean()
    ))
    solved, costs = solve_window_ba(prob, iterations=10, damping=1e-2)
    res1, _, _, w1 = _residual_and_jacobians(solved)
    rms1 = float(np.sqrt(
        (np.asarray(res1) ** 2).sum(1)[np.asarray(w1) > 0].mean()
    ))
    assert rms1 < rms0 * 0.5, (rms0, rms1)
    assert rms1 < 1.0, rms1

    # Optimized later poses closer to ground truth than the perturbed init.
    for i in range(2, 4):
        err_init = np.linalg.norm(poses_init[i][1] - poses_gt[i][1])
        err_opt = np.linalg.norm(
            np.asarray(solved.t)[i] - poses_gt[i][1]
        )
        assert err_opt < err_init, (i, err_init, err_opt)
