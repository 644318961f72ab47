"""Long synthetic-sequence VO accuracy benchmark (config 3-4 stand-in).

No KITTI/TUM data ships in this environment (zero egress), so this
renders a 200+ frame two-depth scene along a known trajectory and runs
the full VO front-end (detect -> describe -> ratio/crosscheck match ->
RANSAC essential -> GN refinement) against ground truth, with optional
photometric/occlusion stress:

* exposure drift: sinusoidal per-frame gain/bias (+-25% / +-12 grey),
* occlusion: a moving textured box covering ~8% of the frame.

Prints per-run stats and one JSON line:
  {"metric": "synthetic_vo_ate_rmse_simaligned", ...}

Usage: python tools/synthetic_vo_bench.py [--frames 200] [--stress]
       [--platform cpu|auto] [--json-out FILE]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_texture(rng, h=1024, w=1024):
    import numpy as np
    from scipy import ndimage

    # Multi-octave noise: structure at several scales so BRISK finds
    # corners at every pyramid level.
    tex = np.zeros((h, w))
    for sigma, amp in ((1.5, 1.0), (6.0, 1.0), (24.0, 0.8)):
        tex += amp * ndimage.gaussian_filter(
            rng.uniform(-1, 1, (h, w)), sigma
        ) / max(sigma / 8.0, 1.0)
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9)
    return (tex * 255).astype(np.uint8)


def trajectory(n):
    """Smooth arc: forward motion + gentle yaw + lateral sway."""
    import numpy as np

    poses = []
    for i in range(n):
        a = 0.004 * i
        yaw = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
             [-np.sin(a), 0, np.cos(a)]]
        )
        t = np.array(
            [0.05 * i + 0.01 * np.sin(0.08 * i), 0.004 * np.sin(0.05 * i),
             0.012 * i]
        )
        poses.append((yaw, t))
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--stress", action="store_true",
                    help="exposure drift + moving occluder")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--normalize-exposure", action="store_true",
                    help="per-frame photometric normalization before "
                         "detection (VoConfig.normalize_exposure)")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--seed", type=int, default=11,
                    help="texture/occluder RNG seed (trajectory fixed); "
                         "the 200-frame ATE is chaotic under small "
                         "detector changes, so robustness claims need "
                         "several seeds — NOTES r4")
    ap.add_argument("--export", default=None,
                    help="write frames as PGM + KITTI poses.txt to DIR "
                         "(for tools/kitti_eval.py keyframed+BA runs) "
                         "and exit")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, "/root/repo")
    from tests.test_vo import render_scene

    from ethzasl_brisk_tpu.geometry import PinholeCamera
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from ethzasl_brisk_tpu.vo import VoConfig, VoFrontend
    from ethzasl_brisk_tpu.vo.evaluate import ate_rmse, rpe

    rng = np.random.default_rng(args.seed)
    tex = make_texture(rng)
    cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, 640, 480)
    poses = trajectory(args.frames)

    occ_tex = make_texture(rng, 160, 200)
    frames = []
    for i, (r, t) in enumerate(poses):
        f = render_scene(tex, cam, r, t).astype(np.float32)
        if args.stress:
            gain = 1.0 + 0.25 * np.sin(0.11 * i)
            bias = 12.0 * np.sin(0.07 * i + 1.0)
            f = f * gain + bias
            # Moving textured occluder (~8% of the frame).
            oy = int(160 + 120 * np.sin(0.05 * i))
            ox = int(40 + 380 * (0.5 + 0.5 * np.sin(0.023 * i)))
            f[oy:oy + 160, ox:ox + 200] = occ_tex[
                : min(160, 480 - oy), : min(200, 640 - ox)
            ]
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    print(f"rendered {len(frames)} frames "
          f"({'stress' if args.stress else 'clean'})", flush=True)

    if args.export:
        from ethzasl_brisk_tpu.core.image_io import write_pgm

        out = pathlib.Path(args.export)
        out.mkdir(parents=True, exist_ok=True)
        gt_lines = []
        for i, (f, (r, t)) in enumerate(zip(frames, poses)):
            write_pgm(str(out / f"{i:06d}.pgm"), f)
            m = np.hstack([r.T, (-r.T @ t)[:, None]])
            gt_lines.append(" ".join(f"{v:.9f}" for v in m.reshape(-1)))
        (out / "poses.txt").write_text("\n".join(gt_lines) + "\n")
        print(f"exported to {out}")
        return

    feature = BriskFeature(
        octaves=2, uniformity_radius=0.0, absolute_threshold=30.0,
        max_candidates=1024, max_keypoints=1024,
    )
    vo = VoFrontend(
        camera=cam, feature=feature,
        config=VoConfig(normalize_exposure=args.normalize_exposure),
    )
    est = vo.run_sequence(frames)
    est_pos = np.stack([p[:3, 3] for p in est])

    gt_pose = []
    for r, t in poses:
        m = np.eye(4)
        m[:3, :3] = r.T
        m[:3, 3] = -r.T @ t  # world-from-camera position
        gt_pose.append(m)
    gt_pos = np.stack([m[:3, 3] for m in gt_pose])

    n = min(len(gt_pos), len(est_pos))
    ate = ate_rmse(est_pos[:n], gt_pos[:n], with_scale=True)
    path_len = float(
        np.linalg.norm(np.diff(gt_pos[:n], axis=0), axis=1).sum()
    )
    try:
        rpe_t = float(rpe(np.stack(est[:n]), np.stack(gt_pose[:n]))[0])
    except Exception:
        rpe_t = float("nan")
    print(
        f"frames {n}  path length {path_len:.2f}  "
        f"ATE RMSE (sim-aligned) {ate:.4f} ({100 * ate / path_len:.2f}% "
        f"of path)  RPE-t {rpe_t:.4f}",
        flush=True,
    )
    line = json.dumps(
        {
            "metric": "synthetic_vo_ate_rmse_simaligned"
            + ("_stress" if args.stress else ""),
            "value": round(float(ate), 4),
            "unit": "m",
            "frames": n,
            "path_length": round(path_len, 2),
            "ate_pct_of_path": round(100 * ate / path_len, 3),
        }
    )
    print(line)
    if args.json_out:
        pathlib.Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
