"""Per-sub-block TPU profile of the reference-RNG block decoder.

First whole-loop measurement (exp_refblock_tpu.py): block decode 112/s
vs faithful while-loops 288/s at K=256 — the block is a 40x COMPILE win
(814s -> 20s) but 0.39x runtime. Hypothesis: the pointer-doubling
take_along_axis gathers dominate (~36 gathers x [33,321] elements per
phi call). This script times each stage standalone to locate the wall.

Methodology: chained calls (output seeds feed the next call) queued
spc-deep, scalar fencing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from mcmc_ammsb_tpu.rng import reference as ref
    from mcmc_ammsb_tpu.rng import refblock

    N = 317_080

    DEPTH = 20

    def timeit(name, fn, seeds0, reps=200):
        @jax.jit
        def chained(seeds):
            def body(s, _):
                out, s2 = fn(s)
                # fold a scalar of the output into the carry so nothing
                # is dead-code eliminated
                s2 = s2 ^ (jnp.asarray(out).ravel()[0] * 0).astype(
                    jnp.uint32)
                return s2, None
            s, _ = jax.lax.scan(body, seeds, None, length=DEPTH)
            return s
        t0 = time.time()
        s = chained(seeds0)
        float(s[0, 0])  # fence compile
        print(f"# {name}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(reps // DEPTH):
            s = chained(s)
        float(s[0, 0])
        dt = time.time() - t0
        per = dt / reps * 1e6
        print(f"{name:36s} {per:9.1f} us/call", file=sys.stderr,
              flush=True)
        return per

    out = {}
    phi_seeds = ref.make_seeds((100, 7), 33)
    beta_seeds = ref.make_seeds((200, 9), 256)
    nodes = (jnp.arange(33, dtype=jnp.int32) * 9601) % N

    out["randn_33x256"] = timeit(
        "randn_block lanes=33 k=256 (phi)",
        lambda s: refblock.randn_block(s, 256), phi_seeds)

    def gen_fn(s):
        hi, lo, seeds_at = refblock.gen_block(s, 320)
        return hi, seeds_at[:, -1]

    out["gen_block_33x320"] = timeit(
        "gen_block lanes=33 m=320", gen_fn, phi_seeds)
    out["randn_256x2"] = timeit(
        "randn_block lanes=256 k=2 (beta)",
        lambda s: refblock.randn_block(s, 2), beta_seeds)
    out["nbr_33x32"] = timeit(
        "neighbors_block lanes=33 num=32",
        lambda s: refblock.sample_neighbors_block(s, nodes, N, 32),
        phi_seeds)
    print(out, flush=True)


if __name__ == "__main__":
    main()
