"""Live matching pipeline over an image directory.

The TPU-native equivalent of the reference's ROS live demo
(``brisk_ros_demo/src/livedemo.cc``): instead of a ROS subscriber + boost
visualizer threads, a native multithreaded loader (native/briskio.cc)
streams PGM frames into the batched device pipeline, which detects,
describes and matches consecutive frames and prints per-batch statistics
(the demo's FPS/HUD, reference livedemo.cc:213).

Usage:
  python examples/live_pipeline.py <dir-with-pgm-frames> [batch] [draw_dir]

With ``draw_dir``, each matched pair is rendered like the reference
visualizer (livedemo.cc:224-296): the two frames side by side, keypoint
circles scaled by size, and green match lines, written as PGM files —
the headless stand-in for its OpenCV window.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ethzasl_brisk_tpu.core.image_io import read_pgm_batch
    from ethzasl_brisk_tpu.parallel import FramePipeline, make_mesh
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from ethzasl_brisk_tpu.utils.timing import Timing, timer

    directory = pathlib.Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/brisk/src/test/test_data"
    )
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    draw_dir = pathlib.Path(sys.argv[3]) if len(sys.argv) > 3 else None
    if draw_dir:
        draw_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(str(p) for p in directory.glob("*.pgm"))
    if not paths:
        raise SystemExit(f"no .pgm files in {directory}")
    # Cycle the directory so the demo always has full batches.
    while len(paths) < batch + 1:
        paths = paths + paths

    feature = BriskFeature(
        octaves=2,
        uniformity_radius=0.0,
        absolute_threshold=30.0,
        max_candidates=512,
        max_keypoints=512,
    )
    pipe = FramePipeline(feature=feature, mesh=make_mesh(1, 1))

    n_batches = max(1, (len(paths) - 1) // batch)
    prev_tail = None
    for bi in range(n_batches):
        chunk = paths[bi * batch : bi * batch + batch]
        with timer("0 load (native threaded)"):
            frames_np = read_pgm_batch(chunk)
        frames = jnp.asarray(frames_np)
        with timer("1 detect+describe+match (device)", block_on=None):
            kps, desc, midx, mdist = pipe.step(frames)
            jax.block_until_ready(mdist)
        n_kp = np.asarray(kps.valid).sum(axis=1)
        n_match = (np.asarray(mdist) < 90).sum(axis=1)
        print(
            f"batch {bi}: frames {len(chunk)}  "
            f"keypoints/frame {n_kp.mean():.0f}  "
            f"matches/pair {n_match.mean():.0f}"
        )
        if draw_dir is not None:
            from examples.draw import draw_matches

            host_kps = jax.tree.map(np.asarray, kps)
            for pi in range(len(chunk) - 1):
                img = draw_matches(
                    frames_np[pi], frames_np[pi + 1],
                    host_kps, pi, np.asarray(midx[pi]),
                    np.asarray(mdist[pi]), max_dist=90,
                )
                from ethzasl_brisk_tpu.core.image_io import write_pgm

                write_pgm(
                    str(draw_dir / f"match_{bi:03d}_{pi:02d}.pgm"), img
                )
        prev_tail = frames_np[-1]
    print()
    print(Timing.print_timing())
    if draw_dir is not None:
        print(f"match visualizations written to {draw_dir}")


if __name__ == "__main__":
    main()
