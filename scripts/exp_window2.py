"""Attribute the windowed engine's regression (exp_window.py: 0.6x).

Measures, at bench shape:
  1. window_impl=jnp rate (same structure, no kernel) — separates the
     cond/gather/scatter structure cost from the kernel cost;
  2. trace-based stage profile of the T=8 pallas program;
  3. standalone kernel microbench: the pallas_call alone in a scan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=1000, device_sampling=True,
                 shared_neighbors=True,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    # 1. jnp windowed rate
    lrn = Learner(cfg.replace(window=8, window_impl="jnp"), graph,
                  split, prefetch=False)
    lrn.run(1000)
    s0 = int(lrn.state.step_count); t0 = time.time()
    lrn.run(5000)
    dt = time.time() - t0
    assert int(lrn.state.step_count) - s0 == 5000
    print(f"# window-T8-jnp: {5000/dt:.0f} updates/s", flush=True)
    lrn.close(); del lrn

    # 2. stage profile of the pallas T=8 program
    lrn = Learner(cfg.replace(window=8), graph, split, prefetch=False)
    print("### stage profile window-T8-pallas", flush=True)
    lrn.print_stage_profile(iters=2000)
    lrn.close(); del lrn

    # 3. standalone kernel microbench: scan of W kernel calls on fixed
    # staged operands (no gather/scatter/cond)
    from mcmc_ammsb_tpu.ops.window import fast_window_pallas
    from mcmc_ammsb_tpu.learner import init_state, DeviceBatch

    t_win = 8
    wcfg = cfg.replace(window=t_win)
    b_cap, e_cap, k = cfg.max_batch_nodes, cfg.max_batch_edges, cfg.K
    nn = cfg.num_node_sample
    rng = np.random.RandomState(0)
    state = init_state(cfg, 16)
    batch = DeviceBatch(
        edges_u=jnp.asarray(rng.randint(0, n, (t_win, e_cap), dtype=np.int32)),
        edges_v=jnp.asarray(rng.randint(0, n, (t_win, e_cap), dtype=np.int32)),
        edge_mask=jnp.ones((t_win, e_cap), bool),
        nodes=jnp.asarray(rng.randint(0, n, (t_win, b_cap), dtype=np.int32)),
        node_mask=jnp.ones((t_win, b_cap), bool),
        weight=jnp.ones((t_win,), jnp.float32),
    )
    xs_t = (batch,
            jnp.asarray(rng.randint(0, n, (t_win, 1, nn), dtype=np.int32)),
            jnp.zeros((t_win, b_cap, nn), bool),
            jnp.asarray(rng.randn(t_win, b_cap, k), jnp.float32),
            jnp.asarray(rng.randn(t_win, k, 2), jnp.float32),
            jnp.zeros((t_win, e_cap), bool),
            jnp.zeros((t_win, e_cap), jnp.int32),
            jnp.zeros((t_win, e_cap), jnp.int32))
    oh = jnp.zeros((t_win, e_cap, b_cap), jnp.float32)

    @jax.jit
    def run_windows(s, n_w):
        def body(st, _):
            return fast_window_pallas(wcfg, st, xs_t, oh, oh), None
        s, _ = jax.lax.scan(body, s, None, length=n_w)
        return s

    import functools
    for n_w in (125,):
        f = functools.partial(run_windows, n_w=n_w)
        s2 = f(state); _ = int(s2.step_count)   # compile+fence
        t0 = time.time()
        s3 = f(s2); _ = int(s3.step_count)
        dt = time.time() - t0
        print(f"# kernel+gather+scatter scan: {dt/n_w*1e6:.1f} us/window"
              f" = {dt/(n_w*t_win)*1e6:.2f} us/step "
              f"({n_w*t_win/dt:.0f} updates/s)", flush=True)


if __name__ == "__main__":
    main()
