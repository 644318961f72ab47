"""KITTI/TUM odometry evaluation harness: VO + keyframing + window BA.

The config-3/4 driver (BASELINE.json): full front-end (BRISK detect ->
describe -> ratio/cross-check match -> essential RANSAC -> GN pose
refinement), keyframe selection, sliding-window bundle adjustment over
the keyframes, and ATE/RPE evaluation against ground truth.

Usage:
  python tools/kitti_eval.py <frames_dir> --gt poses.txt \
      [--gt-format kitti|tum] [--fu F --fv F --cu C --cv C]
      [--max-frames N] [--window W] [--kf-parallax PX] [--no-ba]
      [--no-refine] [--json]

  frames_dir: sorted .pgm or .png/.jpg grayscale frames (KITTI image_0).
  Monocular scale is taken from the ground-truth step norms (standard
  monocular-VO evaluation practice); alignment is similarity (Umeyama).

Keyframing: a frame becomes a keyframe when its median inlier parallax
w.r.t. the previous keyframe exceeds --kf-parallax px, or matching drops
below --kf-min-inliers. Window BA: after every new keyframe, the last
--window keyframes and their chained tracks are refined with the Schur
Gauss-Newton solver (ba/window.py); the pose correction of the newest
keyframe is propagated to the running trajectory.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def load_frames(frames_dir: str, max_frames: int) -> list[np.ndarray]:
    d = pathlib.Path(frames_dir)
    paths = sorted(
        p for p in d.iterdir()
        if p.suffix.lower() in (".pgm", ".png", ".jpg", ".jpeg")
    )[:max_frames]
    if len(paths) < 2:
        raise SystemExit(f"need >=2 frames in {frames_dir}")
    out = []
    for p in paths:
        if p.suffix.lower() == ".pgm":
            from ethzasl_brisk_tpu.core.image_io import read_pgm

            out.append(np.asarray(read_pgm(str(p))))
        else:
            from PIL import Image

            out.append(np.asarray(Image.open(p).convert("L")))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_dir")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--gt-format", choices=["tum", "kitti"], default="kitti")
    ap.add_argument("--fu", type=float, default=718.856)   # KITTI 00 cam0
    ap.add_argument("--fv", type=float, default=718.856)
    ap.add_argument("--cu", type=float, default=607.1928)
    ap.add_argument("--cv", type=float, default=185.2157)
    ap.add_argument("--max-frames", type=int, default=500)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--kf-parallax", type=float, default=12.0)
    ap.add_argument("--kf-min-inliers", type=int, default=60)
    ap.add_argument("--max-keypoints", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=30.0)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--ba-min-track-len", type=int, default=3)
    ap.add_argument("--ba-max-obs-residual", type=float, default=8.0,
                    help="pre-BA track gate: drop observations whose "
                         "initial reprojection residual exceeds this "
                         "(px) and landmarks left with < min-track-len "
                         "observations; rejects coherently-moving "
                         "content (occluders) that robust losses "
                         "inside BA cannot (0 disables)")
    ap.add_argument("--ba-solver", choices=["lm", "trimmed", "gn"],
                    default="trimmed",
                    help="lm = Levenberg-Marquardt with step accept/"
                         "reject (monotone cost: cannot diverge on "
                         "degenerate geometry); trimmed = two-stage LM "
                         "with gross-outlier observation rejection "
                         "between stages (moving-occluder robustness); "
                         "gn = fixed-damping Gauss-Newton (legacy)")
    ap.add_argument("--ba-iters", type=int, default=12)
    ap.add_argument("--ba-max-shift", type=float, default=0.0,
                    help="if > 0, reject a window BA solution that "
                         "moves any keyframe center by more than this "
                         "multiple of the window's median baseline "
                         "(legacy divergence gate for --ba-solver gn; "
                         "the LM solver's accept/reject makes it "
                         "unnecessary)")
    ap.add_argument("--ba-huber", type=float, default=3.0,
                    help="Huber delta in px (0 disables)")
    ap.add_argument("--ba-max-trim-frac", type=float, default=0.08,
                    help="trimmed solver: skip a window whose stage-1 "
                         "outlier-trim fraction exceeds this (coherent "
                         "outliers bias the anchor iterate)")
    ap.add_argument("--no-ba-scale-projection", action="store_true",
                    help="disable the per-window monocular scale-gauge "
                         "projection (median-baseline renormalization "
                         "about the gauge-fixed first keyframe)")
    ap.add_argument("--no-refine", action="store_true",
                    help="disable GN relative-pose refinement")
    ap.add_argument("--min-inlier-spread", type=float, default=0.15,
                    help="reject relative poses whose RANSAC inlier "
                         "bounding box covers less than this fraction "
                         "of the frame area (coherent-foreground/"
                         "occluder consensus; 0 disables)")
    ap.add_argument("--no-normalize-exposure", action="store_true",
                    help="disable per-frame photometric normalization "
                         "(on by default: stabilizes detection under "
                         "exposure drift)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="orbax checkpoint dir; resumes from the latest "
                         "step if one exists (failure recovery)")
    ap.add_argument("--checkpoint-every", type=int, default=10,
                    help="checkpoint every N keyframes")
    args = ap.parse_args()

    # Round-4 default change, called out loudly (ADVICE r4): two
    # heuristic gates are ON by default because they beat the ungated
    # runs on every synthetic clean/stress seed (NOTES r4 table). They
    # CHANGE results vs round-3 invocations; restore the old behavior
    # with --ba-max-obs-residual 0 --min-inlier-spread 0. The spread
    # gate can reject legitimate poses when inliers naturally
    # concentrate (low-texture / distant scenes) — disable it there.
    if args.ba_max_obs_residual or args.min_inlier_spread:
        print(
            "NOTE: pre-BA residual gate "
            f"({args.ba_max_obs_residual} px) and inlier-spread gate "
            f"({args.min_inlier_spread}) are ON (r4 defaults); pass "
            "--ba-max-obs-residual 0 --min-inlier-spread 0 for the "
            "ungated r3 behavior.",
            file=sys.stderr,
        )

    import jax

    # The axon TPU plugin overrides JAX_PLATFORMS; honor an explicit
    # cpu request via the config API (tunneled-TPU compiles are slow for
    # this many distinct shapes).
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.ba.window import (
        solve_window_ba,
        solve_window_ba_lm,
        solve_window_ba_trimmed,
    )
    from ethzasl_brisk_tpu.geometry import PinholeCamera
    from ethzasl_brisk_tpu.match.matcher import (
        match_with_ratio_and_crosscheck,
    )
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from ethzasl_brisk_tpu.vo import VoConfig, VoFrontend
    from ethzasl_brisk_tpu.vo.evaluate import (
        ate_rmse,
        load_kitti_trajectory,
        load_tum_trajectory,
        rpe,
    )
    from ethzasl_brisk_tpu.vo.tracks import build_ba_problem

    frames = load_frames(args.frames_dir, args.max_frames)
    h, w = frames[0].shape
    cam = PinholeCamera.create(args.fu, args.fv, args.cu, args.cv, w, h)
    feature = BriskFeature(
        octaves=2,
        uniformity_radius=0.0,
        absolute_threshold=args.threshold,
        max_candidates=2048,
        max_keypoints=args.max_keypoints,
    )
    # One-shot capacity certification on the first frame (library
    # diagnostics API): silently-truncating caps would skew every
    # downstream match/pose, so flag them loudly up front.
    _, _diag = jax.jit(feature.detect_with_diagnostics)(
        jnp.asarray(frames[0])
    )
    if not bool(np.asarray(_diag.ok)):
        print(
            "WARNING: detector capacity overflow on frame 0 "
            f"(candidates {np.asarray(_diag.cand_counts).tolist()} vs "
            f"caps {np.asarray(_diag.cand_caps).tolist()}); weakest "
            "candidates are dropped — raise max_candidates.",
            file=sys.stderr,
        )

    vo = VoFrontend(
        camera=cam,
        feature=feature,
        config=VoConfig(
            refine_iterations=0 if args.no_refine else 10,
            normalize_exposure=not args.no_normalize_exposure,
            min_inlier_spread=args.min_inlier_spread,
        ),
    )

    gt_poses = None
    scale_norms = None
    if args.gt:
        loader = (
            load_kitti_trajectory
            if args.gt_format == "kitti"
            else load_tum_trajectory
        )
        gt_poses = loader(args.gt)[: len(frames)]
        gt_pos = np.stack([p[:3, 3] for p in gt_poses])
        scale_norms = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1)

    # ---- Frame loop: integrate VO, select keyframes, window-BA. ----
    key = jax.random.PRNGKey(0)
    poses = [np.eye(4)]                 # world-from-camera per frame
    kf = []                             # keyframe records
    n_ba_runs = 0
    start_frame = 0
    ckpt_mgr = None
    if args.checkpoint_dir:
        from ethzasl_brisk_tpu.utils.checkpoint import (
            CheckpointManager,
            pack_vo_loop_state,
            unpack_vo_loop_state,
        )

        ckpt_mgr = CheckpointManager(args.checkpoint_dir)
        saved, step = ckpt_mgr.restore_latest()
        if saved is not None:
            poses, start_frame, key, prev0, kf, n_ba_runs = (
                unpack_vo_loop_state(saved)
            )
            print(f"resumed from step {step}: frame {start_frame}, "
                  f"{len(poses)} poses, {len(kf)} tail keyframes",
                  flush=True)

    def to_cfw(pose_wfc):
        """world-from-camera 4x4 -> camera-from-world (R, t)."""
        r = pose_wfc[:3, :3].T
        t = -r @ pose_wfc[:3, 3]
        return r, t

    prev = None
    n_ba_rejects = 0
    if args.checkpoint_dir and start_frame > 0:
        prev = prev0
    n_kf_total = len(kf)
    last_saved_kf = n_kf_total
    for i, frame in enumerate(frames):
        if i < start_frame:
            continue
        # Crash-consistent checkpoint: the state at the TOP of iteration
        # i reflects every effect of frames < i (incl. their window BA).
        if (
            ckpt_mgr is not None
            and n_kf_total - last_saved_kf >= args.checkpoint_every
            and prev is not None
            and kf
        ):
            ckpt_mgr.save(
                i,
                pack_vo_loop_state(
                    poses=poses, frame_idx=i, key=key, prev=prev,
                    kf=kf, window=args.window, n_frames=len(frames),
                    n_ba_runs=n_ba_runs,
                ),
            )
            last_saved_kf = n_kf_total
        cur = vo.process_frame(jnp.asarray(frame))
        if prev is not None:
            key, sub = jax.random.split(key)
            r, t, n_inl, ok, inl = vo.relative_pose(
                sub, prev[0], prev[1], cur[0], cur[1]
            )
            r = np.asarray(r)
            t = np.asarray(t)
            s = 1.0 if scale_norms is None else float(scale_norms[i - 1])
            t_ab = np.eye(4)
            t_ab[:3, :3] = r.T
            t_ab[:3, 3] = -r.T @ (t * s)
            poses.append(poses[-1] @ t_ab if bool(ok) else poses[-1].copy())
        prev = cur

        # --- keyframe decision vs the last keyframe.
        promote = not kf
        pair_match = None
        if kf:
            key, sub = jax.random.split(key)
            last = kf[-1]
            # chain_tracks convention: current keypoint k matches the
            # previous keyframe's best[k] (query=current, train=last).
            best, matched = match_with_ratio_and_crosscheck(
                cur[1], last["desc"], cur[0].valid, last["kp"].valid,
                max_distance=vo.config.max_hamming,
                ratio_num=vo.config.ratio_num,
                ratio_den=vo.config.ratio_den,
            )
            m = np.asarray(matched)
            b = np.asarray(best)
            n_m = int(m.sum())
            if n_m >= 8:
                lx = np.asarray(last["kp"].x)
                ly = np.asarray(last["kp"].y)
                cx = np.asarray(cur[0].x)
                cy = np.asarray(cur[0].y)
                # parallax: current kpt k matches keyframe kpt b[k].
                sel = np.nonzero(m)[0]
                dx = lx[b[sel]] - cx[sel]
                dy = ly[b[sel]] - cy[sel]
                par = float(np.median(np.hypot(dx, dy)))
            else:
                par = np.inf
            promote = (par > args.kf_parallax) or (
                n_m < args.kf_min_inliers
            )
            if promote:
                # Epipolar-verify the keyframe matches before they feed
                # BA tracks: descriptor-only (ratio+crosscheck) matches
                # carry outliers that dominate the window solutions on
                # weakly textured scenes (measured: nearly every window
                # solution tripping the divergence gate without this).
                key, sub2 = jax.random.split(key)
                _, _, _, ok_kf, inl_kf = vo.relative_pose(
                    sub2, cur[0], cur[1], last["kp"], last["desc"]
                )
                m_ver = m & np.asarray(inl_kf).astype(bool)
                pair_match = (
                    (b, m_ver) if bool(ok_kf) and m_ver.sum() >= 8
                    else (b, m)
                )   # cur keypoint k <- last kf b[k]
        if not promote:
            continue

        kf.append(
            dict(
                frame=i,
                kp=cur[0],
                desc=cur[1],
                match_to_prev=pair_match,
            )
        )
        n_kf_total += 1

        # --- window BA over the last W keyframes.
        if args.no_ba or len(kf) < 3:
            continue
        win = kf[-args.window:]
        pair_matches = [
            k["match_to_prev"] for k in win[1:]
            if k["match_to_prev"] is not None
        ]
        if len(pair_matches) != len(win) - 1:
            continue
        win_frames = [k["frame"] for k in win]
        win_poses = [to_cfw(poses[f]) for f in win_frames]
        keypoint_xy = [
            np.stack([np.asarray(k["kp"].x), np.asarray(k["kp"].y)], 1)
            for k in win
        ]
        prob = build_ba_problem(
            cam, win_poses, keypoint_xy, pair_matches,
            max_landmarks=1024, max_observations=4096,
            min_track_len=args.ba_min_track_len,
            max_obs_residual_px=args.ba_max_obs_residual,
        )
        if int(np.asarray(prob.valid).sum()) < 30:
            continue
        # fix_poses=2: anchor the SE(3) gauge AND the monocular scale
        # gauge on the window's first two (already-estimated) keyframes.
        if args.ba_solver == "lm":
            solved, costs, _ = solve_window_ba_lm(
                prob, iterations=args.ba_iters, damping=1e-2,
                fix_poses=2, huber_delta=args.ba_huber,
            )
        elif args.ba_solver == "trimmed":
            solved, costs, n_trim = solve_window_ba_trimmed(
                prob, iterations=args.ba_iters, damping=1e-2,
                fix_poses=2, huber_delta=args.ba_huber,
            )
            # Window quality gate: a high trimmed fraction means a
            # coherent outlier population (e.g. a moving occluder)
            # dominated the stage-1 solution — the re-solve is then
            # anchored to a biased iterate, so skip the window.
            n_obs = int(np.asarray(prob.valid).sum())
            if n_obs and float(np.asarray(n_trim)) / n_obs > \
                    args.ba_max_trim_frac:
                n_ba_rejects += 1
                continue
        else:
            solved, costs = solve_window_ba(
                prob, iterations=args.ba_iters, damping=1e-2,
                fix_poses=2, huber_delta=args.ba_huber,
            )
        r_new = np.asarray(solved.r)
        t_new = np.asarray(solved.t)
        if not (np.isfinite(r_new).all() and np.isfinite(t_new).all()):
            continue
        if not args.no_ba_scale_projection:
            # Monocular scale-gauge projection: window scale is
            # unobservable to BA (only anchored through the first two
            # keyframes), so weak-geometry windows can stretch the far
            # end; the stretch then compounds multiplicatively through
            # the correction propagation below (measured: stress path
            # length 1309 vs GT 39 without this). Project the solved
            # window back to the odometry scale: rescale camera centers
            # about the gauge-fixed first keyframe so the median
            # inter-keyframe baseline matches the pre-BA window.
            c_new0 = np.einsum(
                "kij,kj->ki", -r_new.transpose(0, 2, 1), t_new
            )
            c_old0 = np.stack([-p[0].T @ p[1] for p in win_poses])
            bn = np.linalg.norm(np.diff(c_new0, axis=0), axis=1)
            bo = np.linalg.norm(np.diff(c_old0, axis=0), axis=1)
            if np.median(bn) > 1e-12:
                s_proj = float(np.median(bo) / np.median(bn))
                c_proj = c_new0[0] + s_proj * (c_new0 - c_new0[0])
                t_new = -np.einsum("kij,kj->ki", r_new, c_proj)
        # Divergence gate: on weak window geometry (near-planar scenes,
        # short baselines) the window solution can slide along a poorly
        # constrained direction; a runaway solution then corrupts every
        # subsequent pose through the correction propagation (measured:
        # path length exploding 10^6x on a synthetic planar sequence).
        # Reject solutions that move any keyframe center by more than
        # ba_max_shift x the window's median inter-keyframe baseline.
        c_old = np.stack(
            [-p[0].T @ p[1] for p in win_poses]
        )
        c_new = np.einsum("kij,kj->ki", -r_new.transpose(0, 2, 1), t_new)
        base = np.linalg.norm(np.diff(c_old, axis=0), axis=1)
        med_base = float(np.median(base)) if len(base) else 0.0
        shift = float(np.linalg.norm(c_new - c_old, axis=1).max())
        if (
            args.ba_max_shift > 0
            and med_base > 0
            and shift > args.ba_max_shift * med_base
        ):
            n_ba_rejects += 1
            continue
        n_ba_runs += 1

        # Propagate: replace window keyframe poses, apply each
        # keyframe's rigid correction to the intermediate frames of its
        # following segment, and the newest keyframe's correction to
        # every frame after it. Correcting ONLY the keyframes leaves
        # the in-between frames on the old trajectory — measured
        # zigzag discontinuities inflating the estimated path length
        # 2-5x over ground truth (24-54 vs GT ~10.5 on the 200-frame
        # synthetic bench) and corrupting ATE.
        old_poses = {f: poses[f].copy() for f in win_frames}
        for j, f in enumerate(win_frames):
            m = np.eye(4)
            m[:3, :3] = r_new[j].T
            m[:3, 3] = -r_new[j].T @ t_new[j]
            poses[f] = m
        for j, f in enumerate(win_frames):
            corr = poses[f] @ np.linalg.inv(old_poses[f])
            seg_end = (
                win_frames[j + 1] if j + 1 < len(win_frames)
                else len(poses)
            )
            for g in range(f + 1, seg_end):
                poses[g] = corr @ poses[g]

    if ckpt_mgr is not None:
        ckpt_mgr.close()
    positions = np.stack([p[:3, 3] for p in poses])
    result = dict(
        frames=len(frames),
        keyframes=len(kf),
        ba_runs=n_ba_runs,
        ba_rejects=n_ba_rejects,
        path_length=float(
            np.linalg.norm(np.diff(positions, axis=0), axis=1).sum()
        ),
    )
    if gt_poses is not None:
        gt_pos = np.stack([p[:3, 3] for p in gt_poses])[: len(positions)]
        result["ate_rmse"] = float(ate_rmse(positions, gt_pos))
        trans_err, rot_err = rpe(
            np.stack(poses), np.stack(gt_poses)[: len(poses)], delta=1
        )
        result["rpe_trans_rmse"] = float(trans_err)
        result["rpe_rot_rmse_deg"] = float(rot_err)

    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            tag = {"ate_rmse": "ATE RMSE"}.get(k, k)
            print(f"{tag}: {v}")


if __name__ == "__main__":
    main()
