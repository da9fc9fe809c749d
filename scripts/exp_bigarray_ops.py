"""What does ONE touch of the big [N,K] array cost inside a scan?

Isolates the per-op cost of the four big-array primitives at bench
shape (N=317k, K=256, 64 rows, S=200 steps/dispatch): contiguous
dynamic_slice read, random-row gather read, contiguous
dynamic_update_slice write, random-row scatter write — plus stacked
variants (2x, 4x gathers) to separate fixed per-op cost from per-row
cost. This decides whether fewer-bigger ops (windowed engine) can beat
the current ~13 big-array touches per step.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import functools
import time

import jax
import jax.numpy as jnp

N, K, B, S = 317_080, 256, 64, 200
DISPATCHES = 20


def bench(name, make_body, carry_extra=None):
    idx = jax.random.randint(jax.random.key(7), (S, B), 0, N - B,
                             jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(c, idx):
        return jax.lax.scan(make_body, c, idx)[0]

    pi = jax.random.uniform(jax.random.key(0), (N, K), jnp.float32)
    c = (pi, jnp.asarray(0.0)) if carry_extra else pi
    c = run(c, idx)
    leaf = jax.tree_util.tree_leaves(c)[0]
    _ = float(leaf.ravel()[0])
    t0 = time.time()
    for _ in range(DISPATCHES):
        c = run(c, idx)
    leaf = jax.tree_util.tree_leaves(c)[0]
    _ = float(leaf.ravel()[0])
    us = (time.time() - t0) / (DISPATCHES * S) * 1e6
    print(f"{name:22s} {us:8.2f} us/step", flush=True)
    return us


def main():
    print(f"# devices: {jax.devices()}")

    def slice_read(c, ix):
        pi, acc = c
        rows = jax.lax.dynamic_slice(pi, (ix[0], 0), (B, K))
        return (pi, acc + jnp.sum(rows)), None
    bench("slice-read", slice_read, carry_extra=True)

    def gather_read(c, ix):
        pi, acc = c
        rows = pi[ix]
        return (pi, acc + jnp.sum(rows)), None
    bench("gather-read", gather_read, carry_extra=True)

    def gather_read_x2(c, ix):
        pi, acc = c
        r1 = pi[ix]
        r2 = pi[(ix + 131) % (N - B)]
        return (pi, acc + jnp.sum(r1) + jnp.sum(r2)), None
    bench("gather-read-x2", gather_read_x2, carry_extra=True)

    def gather_read_2b(c, ix):
        pi, acc = c
        ix2 = jnp.concatenate([ix, (ix + 131) % (N - B)])
        rows = pi[ix2]
        return (pi, acc + jnp.sum(rows)), None
    bench("gather-read-2B-1op", gather_read_2b, carry_extra=True)

    def slice_write(pi, ix):
        rows = jax.lax.dynamic_slice(pi, (ix[0], 0), (B, K)) * 1.000001
        return jax.lax.dynamic_update_slice(pi, rows, (ix[0], 0)), None
    bench("slice-rw (DS+DUS)", slice_write)

    def gather_scatter(pi, ix):
        rows = pi[ix] * 1.000001
        return pi.at[ix].set(rows, mode="drop"), None
    bench("gather+scatter", gather_scatter)

    def slice_write_static(pi, ix):
        rows = jax.lax.dynamic_slice(pi, (ix[0], 0), (B, K)) * 1.000001
        out = jax.lax.dynamic_update_slice(pi, rows, (ix[0], 0))
        return out, None
    # same as slice-rw; keep one

    def scatter_only(pi, ix):
        rows = jax.lax.dynamic_slice(pi, (0, 0), (B, K)) * 1.000001
        return pi.at[ix].set(rows, mode="drop"), None
    bench("staticread+scatter", scatter_only)

    def dus_only(pi, ix):
        rows = jax.lax.dynamic_slice(pi, (0, 0), (B, K)) * 1.000001
        return jax.lax.dynamic_update_slice(pi, rows, (ix[0], 0)), None
    bench("staticread+DUS", dus_only)


if __name__ == "__main__":
    main()
