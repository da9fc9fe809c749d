"""How does in-scan scatter cost scale with scattered row count?

If a 512-row scatter costs about the same as a 64-row one (fixed
issue/setup cost), then staging W steps of rows and flushing every W
steps (windowed scatter) divides the per-step scatter cost by W.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import functools
import time

import jax
import jax.numpy as jnp

N, K, S = 317_080, 256, 200
DISPATCHES = 20


def main():
    key = jax.random.key(0)
    pi0 = jax.random.uniform(key, (N, K), jnp.float32)
    print(f"# devices: {jax.devices()}")

    for B in (64, 128, 256, 512, 1024, 2048):
        idx = jax.random.randint(jax.random.key(B), (S, B), 0, N,
                                 jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(pi, idx):
            def body(pi, ix):
                rows = pi[ix] * 1.000001
                return pi.at[ix].set(rows, mode="drop"), None
            return jax.lax.scan(body, pi, idx)[0]

        pi = jnp.array(pi0)
        pi = step(pi, idx)
        _ = float(pi[0, 0])
        t0 = time.time()
        for _ in range(DISPATCHES):
            pi = step(pi, idx)
        _ = float(pi[0, 0])
        us = (time.time() - t0) / (DISPATCHES * S) * 1e6
        print(f"B={B:5d}: {us:8.2f} us/step  ({us/B*1e3:6.1f} ns/row "
              "incl gather)", flush=True)


if __name__ == "__main__":
    main()
