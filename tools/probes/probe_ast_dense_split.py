"""Stage split of the dense AST detect path on the real TPU.

Times each dense sub-stage in isolation (own jit + checksum readback):
pyramid+maps, t58, earliest-toucher, per-layer scans, is_max_2d x2,
aux maps, extraction. Usage: probe_ast_dense_split.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import bench_frames
    from ethzasl_brisk_tpu.detect import ast_dense as D
    from ethzasl_brisk_tpu.detect import ast_scale_space as A
    from ethzasl_brisk_tpu.kernels.agast import agast5_8_score_map
    from tools.tpu_timing import burn_in

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    frames = jnp.asarray(bench_frames(batch))
    thr, octv = 70, 3
    caps = (768, 576, 512, 256, 128, 64)

    def timed(name, fn, reps=3):
        jf = jax.jit(jax.vmap(fn))
        for _ in range(2):
            o = jf(frames)
            acc = sum(
                jnp.sum(x, dtype=jnp.float32)
                for x in jax.tree_util.tree_leaves(o)
            )
            float(np.asarray(acc))
        t0 = time.perf_counter()
        accs = []
        for _ in range(reps):
            o = jf(frames)
            accs.append(sum(
                jnp.sum(x, dtype=jnp.float32)
                for x in jax.tree_util.tree_leaves(o)
            ))
        float(np.asarray(sum(accs)))
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:28s} {dt*1e3:8.1f} ms/batch{batch}", flush=True)

    def pyr(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        return [la.cache for la in layers] + [la.corner for la in layers]

    def pyr_t58(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        return agast5_8_score_map(layers[0].img)

    def etm_all(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        return [A.earliest_toucher_map(la) for la in layers]

    def scans_all(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        t58 = agast5_8_score_map(layers[0].img)
        out = []
        for i in range(len(layers)):
            g, f, ia, ib = D.dense_layer_scans(layers, i, t58)
            out += [g, ia, ib, f[0], f[3]]
        return out

    def scan_l0_above(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        c = D._masked_cache(layers[0])
        return D.dense_score_patch_max(
            layers[1], layers[0].img.shape, c, "above_octave"
        )

    def scan_l2_below(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        c = D._masked_cache(layers[2])
        return D.dense_score_patch_max(
            layers[1], layers[2].img.shape, c, "below_intra"
        )

    def ismax_pass1(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        return [D.dense_is_max_2d(la) for la in layers]

    def aux_all(im):
        layers = D.build_ast_pyramid(im, octv, thr)
        t58 = agast5_8_score_map(layers[0].img)
        etm = [A.earliest_toucher_map(la) for la in layers]
        p1 = []
        for i in range(len(layers)):
            is2d = D.dense_is_max_2d(layers[i], etm[i])
            _, _, ia, ib = D.dense_layer_scans(layers, i, t58)
            p1.append(dict(is2d=is2d, patch_touched=is2d & ia & ib,
                           above_ok=ia))
        out = []
        for eq, ep, pre in D.dense_aux_maps(layers, p1, etm=etm):
            out += [eq, ep, pre]
        return out

    def full(im):
        return D.detect_ast_keypoints_dense(
            im, threshold=thr, octaves=octv,
            max_candidates_per_layer=caps,
        )

    burn_in()
    timed("pyramid+maps", pyr)
    timed("pyramid+t58", pyr_t58)
    timed("pyramid+etm", etm_all)
    timed("pyramid+scan l0 above", scan_l0_above)
    timed("pyramid+scan l2 below", scan_l2_below)
    timed("pyramid+scans all", scans_all)
    timed("pyramid+ismax pass1", ismax_pass1)
    timed("pyramid+aux(p1+aux)", aux_all)
    timed("FULL dense detect", full)


if __name__ == "__main__":
    main()
