"""Experiment: why does the pi row scatter cost 5.9 us/step?

The fused-profile wall at K=256 is pi_scatter at 5.9 us for only B=64
rows + 64 scalars (docs/design.md round 2) while the row GATHER of the
same shapes costs ~2.6 us. This script isolates the scatter inside a
scan at bench shape and times formulations:

  gather-only     control (no write-back)
  rows+scalars    production scatter_rows: [B,K] rows into [N,K] and
                  [B] scalars into [N]
  rows-only       just the [B,K] row scatter
  scalars-only    just the [B] -> [N] scalar scatter
  sums-as-rows    phi_sum stored [N,1]; scalar scatter becomes a [B,1]
                  row scatter
  fused-col       pi and phi_sum in ONE [N,K+1] buffer, one scatter
  dus-loop        fori_loop of per-row dynamic_update_slice
  scatter-add     delta add instead of set

Timing: every variant runs S=200 steps/dispatch, fenced with a scalar
readback (axon tunnel rule, CLAUDE.md).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N, K, B, S = 317_080, 256, 64, 200
DISPATCHES = 20


def timeit(fn, state, idx):
    """fn(*state, idx) -> state' (donation-safe: outputs re-fed)."""
    state = fn(*state, idx)
    if not isinstance(state, tuple):
        state = (state,)
    _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])  # fence warmup
    t0 = time.time()
    for _ in range(DISPATCHES):
        state = fn(*state, idx)
        if not isinstance(state, tuple):
            state = (state,)
    _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    dt = time.time() - t0
    return dt / (DISPATCHES * S) * 1e6  # us/step


def make_inputs(key):
    k1, k2 = jax.random.split(key)
    pi = jax.random.uniform(k1, (N, K), jnp.float32)
    phi_sum = jnp.sum(pi, axis=1)
    idx = jax.random.randint(k2, (S, B), 0, N, jnp.int32)
    return pi, phi_sum, idx


def run_scan(body, carry, idx):
    return jax.lax.scan(body, carry, idx)[0]


def main():
    pi, phi_sum, idx = make_inputs(jax.random.key(0))
    pi_ext = jnp.concatenate([pi, phi_sum[:, None]], axis=1)  # [N, K+1]
    phi_sum_2d = phi_sum[:, None]

    def gather_rows(pi, ix):
        return pi[ix] * 1.000001  # [B, K]

    # --- control: gather only
    @jax.jit
    def v_gather(pi, idx):
        def body(c, ix):
            return c, jnp.sum(gather_rows(pi, ix))
        _, ys = jax.lax.scan(body, 0.0, idx)
        return ys

    # --- production: rows + scalars
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v_prod(pi, phi_sum, idx):
        def body(c, ix):
            pi, ps = c
            rows = gather_rows(pi, ix)
            pi = pi.at[ix].set(rows, mode="drop")
            ps = ps.at[ix].set(rows[:, 0], mode="drop")
            return (pi, ps), None
        return run_scan(body, (pi, phi_sum), idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def v_rows(pi, idx):
        def body(pi, ix):
            rows = gather_rows(pi, ix)
            return pi.at[ix].set(rows, mode="drop"), None
        return run_scan(body, pi, idx)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v_scalars(pi, phi_sum, idx):
        def body(c, ix):
            pi, ps = c
            rows = gather_rows(pi, ix)
            ps = ps.at[ix].set(rows[:, 0], mode="drop")
            return (pi, ps), None
        return run_scan(body, (pi, phi_sum), idx)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v_sums_rows(pi, ps2d, idx):
        def body(c, ix):
            pi, ps = c
            rows = gather_rows(pi, ix)
            pi = pi.at[ix].set(rows, mode="drop")
            ps = ps.at[ix].set(rows[:, :1], mode="drop")
            return (pi, ps), None
        return run_scan(body, (pi, ps2d), idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def v_fused_col(pi_ext, idx):
        def body(pe, ix):
            rows = pe[ix] * 1.000001  # [B, K+1]
            return pe.at[ix].set(rows, mode="drop"), None
        return run_scan(body, pi_ext, idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def v_dus(pi, idx):
        def body(pi, ix):
            rows = gather_rows(pi, ix)
            def write(i, pi):
                row = jax.lax.dynamic_slice(rows, (i, 0), (1, K))
                return jax.lax.dynamic_update_slice(pi, row, (ix[i], 0))
            return jax.lax.fori_loop(0, B, write, pi), None
        return run_scan(body, pi, idx)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v_nosc(pi, acc, idx):
        def body(c, ix):
            pi, acc = c
            rows = gather_rows(pi, ix)
            return (pi, acc + jnp.sum(rows)), None
        return jax.lax.scan(body, (pi, acc), idx)[0]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def v_sorted(pi, idx):
        def body(pi, ix):
            ix = jnp.sort(ix)
            rows = gather_rows(pi, ix)
            return pi.at[ix].set(rows, mode="drop"), None
        return run_scan(body, pi, idx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def v_add(pi, idx):
        def body(pi, ix):
            rows = gather_rows(pi, ix)
            delta = rows - pi[ix]
            return pi.at[ix].add(delta, mode="drop"), None
        return run_scan(body, pi, idx)

    print(f"# devices: {jax.devices()}")
    results = {}
    # control has no donation; time it directly
    ys = v_gather(pi, idx)
    _ = float(ys[0])
    t0 = time.time()
    for _ in range(DISPATCHES):
        ys = v_gather(pi, idx)
    _ = float(ys[0])
    results["gather-only"] = (time.time() - t0) / (DISPATCHES * S) * 1e6
    for name, fn, args in [
        ("no-scatter", v_nosc, (pi, jnp.asarray(0.0))),
        ("rows+scalars", v_prod, (pi, phi_sum)),
        ("rows-only", v_rows, (pi,)),
        ("rows-sorted", v_sorted, (pi,)),
        ("scalars-only", v_scalars, (pi, phi_sum)),
    ]:
        # measured once and parked (run 1 of this script): sums-as-rows
        # 40.8, fused-col 28.0, dus-loop 139.5, scatter-add 14.9 us/step
        # (v_sums_rows / v_fused_col / v_dus / v_add above, not re-run)
        # donated buffers: rebuild fresh inputs per variant
        fresh = tuple(jnp.array(a) for a in args)
        results[name] = timeit(fn, fresh, idx)
        print(f"{name:14s} {results[name]:8.2f} us/step", flush=True)
    print(f"{'gather-only':14s} {results['gather-only']:8.2f} us/step "
          "(control)")


if __name__ == "__main__":
    main()
