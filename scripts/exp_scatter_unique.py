"""Does `unique_indices=True` ALONE unlock a faster TPU scatter?

The round-2 negative (docs/design.md "scatter index hints") measured
unique_indices=True *combined with* indices_are_sorted=True: 26x
SLOWER (the sorted hint selects a serializing lowering). This isolates
the unique hint, which the window engine can honestly assert (the
last-write-wins mask guarantees one write per row; masked lanes can be
given DISTINCT out-of-range sentinels so the promise holds globally).

Why bother: at C=16 the window scatter costs ~96 ns/row while XLA's
own GATHER does the same random-1KB-row pattern at ~10 ns/row — the
10x asymmetry is the scatter lowering preserving duplicate-index
application order, which unique indices make unnecessary.

Shapes mirror the production windows:
  - "c16": pi [16*317080, 256] f32 (5.2 GB), 3168 rows/window
  - "c1":  pi [317080, 256] f32 (325 MB),     396 rows/window

Run alone on the real TPU: python scripts/exp_scatter_unique.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

W = 50          # windows per timed dispatch


@partial(jax.jit, static_argnames=("unique",), donate_argnums=(0,))
def run_plain(pi, idx, rows, unique=False):
    def body(p, i):
        return p.at[i].set(rows, mode="drop",
                           unique_indices=unique), None
    pi, _ = jax.lax.scan(body, pi, idx)
    return pi


def measure(label, m_rows, r_rows, unique, dtype=jnp.float32,
            trials=3):
    k = 256
    pi = jnp.zeros((m_rows, k), dtype)
    rows = jnp.ones((r_rows, k), dtype)
    rng = np.random.default_rng(0)
    # genuinely unique indices per window (the hint must be honest)
    idx = np.stack([rng.choice(m_rows, size=r_rows, replace=False)
                    for _ in range(W)]).astype(np.int32)
    idx = jnp.asarray(idx)
    pi = run_plain(pi, idx, rows, unique=unique)     # compile+warm
    float(pi[0, 0])                                  # fence
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        pi = run_plain(pi, idx, rows, unique=unique)
        float(pi[0, 0])                              # fenced readback
        best = min(best, time.time() - t0)
    ns_row = best / (W * r_rows) * 1e9
    print(f"# {label}: {best*1e3:.2f} ms / {W} windows -> "
          f"{ns_row:.1f} ns/row", flush=True)
    return ns_row


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    n = 317_080
    measure("c1  plain  f32", n, 396, unique=False)
    measure("c1  unique f32", n, 396, unique=True)
    measure("c16 plain  f32", 16 * n, 3168, unique=False)
    measure("c16 unique f32", 16 * n, 3168, unique=True)
    measure("c16 plain  bf16", 16 * n, 3168, unique=False,
            dtype=jnp.bfloat16)
    measure("c16 unique bf16", 16 * n, 3168, unique=True,
            dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
