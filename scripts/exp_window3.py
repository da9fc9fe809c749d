"""Decompose the windowed regression: dirty fraction, forced-clean
rate (fast path only), forced-dirty rate (cond overhead + sequential
branch only)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner
    from mcmc_ammsb_tpu.ops import window as win_mod

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

    # empirical dirty fraction at several T (host-side, sampled ids)
    from mcmc_ammsb_tpu.ops.device_sampling import sample_minibatches_device
    from mcmc_ammsb_tpu.ops.edgeset import build_edge_set
    import jax
    tset = build_edge_set(cfg.edgeset_backend, cfg.N, graph.edges_u,
                          graph.edges_v)
    hset = build_edge_set(cfg.edgeset_backend, cfg.N, split.heldout_u,
                          split.heldout_v)
    adj = (jnp.asarray(graph.offsets, jnp.int32),
           jnp.asarray(graph.cols, jnp.int32))
    key = jax.random.PRNGKey(7)
    ds = sample_minibatches_device(cfg, tset, hset, key, 1024, adj)
    nbr = jax.vmap(lambda k: jax.random.randint(
        k, (1, cfg.num_node_sample), 0, cfg.N))(
        jax.random.split(jax.random.PRNGKey(8), 1024))
    for t_win in (2, 4, 8, 16):
        w = 1024 // t_win
        nodes = ds.nodes[: w * t_win].reshape(w, t_win, -1)
        mask = ds.node_mask[: w * t_win].reshape(w, t_win, -1)
        nb = nbr[: w * t_win, 0, :].reshape(w, t_win, -1)
        d = np.asarray(win_mod._dirty_windows(nodes, mask, nb, t_win))
        print(f"# T={t_win}: dirty fraction {d.mean():.3f}", flush=True)

    real_dirty = win_mod._dirty_windows

    def run_rate(label, t_win, force=None):
        if force is None:
            win_mod._dirty_windows = real_dirty
        else:
            win_mod._dirty_windows = (
                lambda nodes, mask, nbrs, tw, _f=force:
                jnp.full((nodes.shape[0],), _f, bool))
        lrn = Learner(cfg.replace(window=t_win), graph, split,
                      prefetch=False)
        lrn.run(1000)
        s0 = int(lrn.state.step_count); t0 = time.time()
        lrn.run(5000)
        dt = time.time() - t0
        assert int(lrn.state.step_count) - s0 == 5000
        print(f"# {label}: {5000/dt:.0f} updates/s", flush=True)
        lrn.close()

    try:
        run_rate("T8 forced-CLEAN (fast path only)", 8, force=False)
        run_rate("T8 forced-DIRTY (cond + sequential)", 8, force=True)
        run_rate("T4 forced-CLEAN", 4, force=False)
        run_rate("T16 forced-CLEAN", 16, force=False)
    finally:
        win_mod._dirty_windows = real_dirty


if __name__ == "__main__":
    main()
