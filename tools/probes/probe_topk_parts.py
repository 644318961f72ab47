"""Probe: building blocks for a quad-compacted exact top-k.

Strict-tie structure: all maxima inside one 2x2 quad are equal-valued
(mutually adjacent maxima tie under the reference's >=-survives NMS),
so a quad carries (max value, 4-bit occupancy nibble) losslessly. The
candidate pipeline then becomes:
  quad-reduce (1 pass) -> top_k(n/4 -> k) -> aux gather (k) ->
  arithmetic expand x4 -> top_k(4k -> k) -> lexsort(k) exact order.
This probe times each block at bench shapes to decide if the chain
beats lax.top_k(n -> k) = 34 ms (probe_compact_topk, 2026-08-20).

Run on TPU: python tools/probe_topk_parts.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]
from tpu_timing import burn_in, timed  # noqa: E402

B, H, W, K = 64, 480, 640, 8192
N = H * W


def main():
    print("devices", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    sc = jnp.asarray(
        rng.integers(-2**30, 2**30, (B, H, W), dtype=np.int64).astype(
            np.int32
        )
    )
    mask = jnp.asarray(rng.random((B, H, W)) < 0.02)
    burn_in(4.0)

    mmin = jnp.iinfo(jnp.int32).min

    timed("baseline top_k n=307k k=8k",
          lambda s, m: jax.lax.top_k(
              jnp.where(m, s, mmin).reshape(B, N), K), sc, mask)

    timed("top_k n=307k k=1k",
          lambda s, m: jax.lax.top_k(
              jnp.where(m, s, mmin).reshape(B, N), 1024), sc, mask)

    def quad_reduce(s, m):
        x = jnp.where(m, s, mmin)
        x4 = x.reshape(B, H // 2, 2, W // 2, 2)
        vq = x4.max(axis=(2, 4))
        bits = jnp.asarray([1, 2, 4, 8], jnp.int32).reshape(1, 1, 2, 1, 2)
        aux = jnp.sum(
            m.reshape(B, H // 2, 2, W // 2, 2).astype(jnp.int32) * bits,
            axis=(2, 4),
        )
        return vq, aux

    timed("quad reduce (val+aux)", quad_reduce, sc, mask)

    vq, aux = quad_reduce(sc, mask)
    vqf = vq.reshape(B, N // 4)
    auxf = aux.reshape(B, N // 4)

    timed("top_k n=76.8k k=8k",
          lambda v: jax.lax.top_k(v, K), vqf)

    _, qidx = jax.lax.top_k(vqf, K)

    timed("gather aux (B,8k) from (B,76.8k)",
          lambda a, i: jnp.take_along_axis(a, i, axis=-1), auxf, qidx)

    vals32 = jnp.asarray(
        rng.integers(-2**30, 2**30, (B, 4 * K), dtype=np.int64).astype(
            np.int32
        )
    )
    timed("top_k n=32k k=8k", lambda v: jax.lax.top_k(v, K), vals32)

    valsk = jnp.asarray(
        rng.integers(-2**30, 2**30, (B, K), dtype=np.int64).astype(np.int32)
    )
    idxk = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))
    timed("lexsort k=8k",
          lambda v, i: jax.vmap(lambda vv, ii: jnp.lexsort((ii, ~vv)))(v, i),
          valsk, idxk)

    timed("gather (B,8k) from (B,307k) x1",
          lambda s, i: jnp.take_along_axis(
              s.reshape(B, N), i, axis=-1), sc, idxk)

    timed("full sort n=307k",
          lambda s: jnp.sort(s.reshape(B, N), axis=-1), sc)


if __name__ == "__main__":
    main()
