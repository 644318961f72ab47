"""Probe: where does the compact top-k lose on TPU?

BENCH_TOPK=compact measured detect 186 -> 1443 ms/batch64 (2026-08-20).
This times the pieces of kernels/topk.topk_from_mask at bench shapes
(batch 64, layer-0 map 480x640 = 307200) against lax.top_k, to find the
pathological op: cumsum over the full map, searchsorted (19-step scan
loop?), or the k-element lexsort.

Run on TPU: python tools/probe_compact_topk.py
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import os
import sys
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]
from tpu_timing import burn_in, timed  # noqa: E402

B, N, K = 64, 307200, 8192


def main():
    print("devices", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(-2**30, 2**30, (B, N), dtype=np.int64).astype(np.int32)
    )
    mask = jnp.asarray(rng.random((B, N)) < 0.02)  # ~6.1k/row, like layer 0
    burn_in(4.0)

    timed("lax.top_k (B,N)->K", lambda a: jax.lax.top_k(a, K), x)

    timed("cumsum i32 axis=-1", lambda m: jnp.cumsum(m, axis=-1),
          mask.astype(jnp.int32))

    csum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    q = jnp.arange(1, K + 1, dtype=jnp.int32)

    timed(
        "searchsorted (vmapped)",
        lambda c: jax.vmap(lambda r: jnp.searchsorted(r, q, side="left"))(c),
        csum,
    )

    # Hand-rolled binary search: fori_loop of 19 steps, each ONE
    # vectorized take of (B, K) from (B, N) — advanced-index gathers are
    # fast on TPU where vmapped dynamic_slice serializes (NOTES).
    def bsearch(c):
        lo = jnp.zeros((B, K), jnp.int32)
        hi = jnp.full((B, K), N, jnp.int32)
        qq = q[None, :]

        def body(_, st):
            lo, hi = st
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(c, mid, axis=-1)
            ge = v >= qq
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 19, body, (lo, hi))
        return lo

    timed("bsearch take_along_axis", bsearch, csum)

    # Collision-free scatter compaction: masked element i writes its own
    # index to slot csum[i]-1; unmasked dumped out of bounds (dropped).
    def scatter_compact(m, c):
        iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        tgt = jnp.where(m, c - 1, K + 7)

        def one(tg, io):
            return jnp.full((K,), N, jnp.int32).at[tg].set(
                io, mode="drop", unique_indices=True
            )

        return jax.vmap(one)(tgt, iota)

    timed("scatter compaction", scatter_compact, mask, csum)

    vals = jnp.asarray(
        rng.integers(-2**30, 2**30, (B, K), dtype=np.int64).astype(np.int32)
    )
    idx = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))
    timed(
        "lexsort (idx, ~vals) K",
        lambda v, i: jax.vmap(lambda vv, ii: jnp.lexsort((ii, ~vv)))(v, i),
        vals, idx,
    )

    from ethzasl_brisk_tpu.kernels.topk import topk_from_mask

    timed(
        "topk_from_mask full",
        lambda a, m: jax.vmap(lambda aa, mm: topk_from_mask(aa, mm, K))(a, m),
        x, mask,
    )

    # Two-level cumsum formulation: per-512-block sums -> tiny scan ->
    # broadcast offsets + intra-block lane cumsum.
    def cumsum2(m):
        mb = m.reshape(B, N // 512, 512)
        bs = mb.sum(axis=-1)
        off = jnp.cumsum(bs, axis=-1) - bs
        return (jnp.cumsum(mb, axis=-1) + off[..., None]).reshape(B, N)

    timed("cumsum two-level 512", cumsum2, mask.astype(jnp.int32))


if __name__ == "__main__":
    main()
