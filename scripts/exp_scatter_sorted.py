"""Does sorting scatter/gather indices fix the big-array row-cost knee?

Round-3 finding (docs/design.md): scatter per-row cost rises with the
TARGET ARRAY size — ~39 ns/row into a 0.3 GB array, ~88 ns at 2.6 GB,
~184 ns at 5.2 GB — suggesting page/TLB locality, not row count, sets
the marginal cost. If so, sorting a window's scatter indices (and
permuting the staged rows to match) should restore ordered-write
locality for ~free (argsort of 6k ints + a 6 MB row permute).

Measured IN-SCAN (single-dispatch microbenchmarks over the axon
tunnel pay ~700 us RPC and drown the marginal cost; CLAUDE.md).

Run on the real TPU:  python scripts/exp_scatter_sorted.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 200


def bench_scan(step, big_shape, xs, iters=ITERS):
    """Time one jit'd lax.scan of ``step`` over xs, donated carry."""
    @jax.jit
    def run(p, xs):
        def body(carry, x):
            return step(carry, x), None
        out, _ = jax.lax.scan(body, p, xs)
        return out

    p = jnp.ones(big_shape, jnp.float32)
    p = run(p, xs)
    _ = float(p[0, 0])                         # fence (compile+warm)
    t0 = time.time()
    p = run(p, xs)
    _ = float(p[0, 0])
    return (time.time() - t0) / iters


def main():
    k = 256
    n_rows = 6144                              # C=8, T=12, B=64
    key = jax.random.PRNGKey(0)
    # one shared rows payload (values don't change scatter cost)
    rows = jax.random.uniform(key, (n_rows, k))
    for gb, big_n in ((0.3, 317_080), (2.6, 8 * 317_080),
                      (5.2, 16 * 317_080)):
        idx = jax.random.randint(key, (ITERS, n_rows), 0, big_n)
        idx_sorted = jnp.sort(idx, axis=1)

        def scat(p, i):
            return p.at[i].set(rows)

        def scat_fly(p, i):
            order = jnp.argsort(i)
            return p.at[i[order]].set(rows[order])

        t_rand = bench_scan(scat, (big_n, k), idx)
        t_sorted = bench_scan(scat, (big_n, k), idx_sorted)
        t_fly = bench_scan(scat_fly, (big_n, k), idx)

        pi = jnp.ones((big_n, k), jnp.float32)

        def gath(out, i):
            return out * 0.5 + pi[i]

        g_rand = bench_scan(gath, (n_rows, k), idx)
        g_sorted = bench_scan(gath, (n_rows, k), idx_sorted)
        print(f"# {gb:.1f}GB array: "
              f"scatter rand {t_rand*1e6:.1f}us "
              f"({t_rand/n_rows*1e9:.1f}ns/row), "
              f"pre-sorted {t_sorted*1e6:.1f}us "
              f"({t_sorted/n_rows*1e9:.1f}ns/row), "
              f"sort-on-fly {t_fly*1e6:.1f}us "
              f"({t_fly/n_rows*1e9:.1f}ns/row); "
              f"gather rand {g_rand*1e6:.1f}us "
              f"({g_rand/n_rows*1e9:.1f}ns/row), "
              f"sorted {g_sorted*1e6:.1f}us "
              f"({g_sorted/n_rows*1e9:.1f}ns/row)",
              flush=True)
        del pi, idx, idx_sorted
        time.sleep(1)


if __name__ == "__main__":
    main()
