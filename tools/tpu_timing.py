"""Shared honest-timing helpers for TPU probes.

Two hard-won rules (NOTES.md):
1. block_until_ready does NOT force execution on the tunneled backend —
   chain a device-side checksum and read ONE scalar back.
2. The FIRST timed region in a process reads 10-20x slower than steady
   state regardless of per-stage warm-up (measured: the same pyramid
   stage timed first = 57 ms, timed later = 5.8 ms). Every probe must
   burn in the process first AND report the min/median over several
   timed repetitions, not a single chained loop.
"""
from __future__ import annotations

import time

import numpy as np


def _checksum(out):
    import jax
    import jax.numpy as jnp

    leaves = [
        x for x in jax.tree_util.tree_leaves(out)
        if isinstance(x, jax.Array)
    ]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def burn_in(seconds: float = 3.0):
    """Run a dummy compiled loop until the backend reaches steady state."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: a @ a + 1.0)
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        acc = _checksum(f(x))
        float(np.asarray(acc))


def timed(name, fn, *args, iters: int = 8, reps: int = 3, warm: int = 4):
    """Compile+warm fn, then time `reps` chained-checksum loops of
    `iters` calls each; report the MIN rep (tunnel noise is one-sided).
    """
    import jax
    import jax.numpy as jnp

    fn_j = jax.jit(fn)
    for _ in range(warm):
        float(np.asarray(_checksum(fn_j(*args))))
    best = float("inf")
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = acc + _checksum(fn_j(*args))
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        vals.append(dt)
        best = min(best, dt)
    spread = (max(vals) - min(vals)) / best * 100 if best else 0.0
    print(
        f"{name:<44s} {best * 1e3:9.2f} ms/iter  "
        f"(reps {', '.join(f'{v*1e3:.1f}' for v in vals)}; "
        f"spread {spread:.0f}%)",
        flush=True,
    )
    return best
