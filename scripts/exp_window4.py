"""Stage profile of the FORCED-CLEAN windowed fast path (T=8) plus
the real mixed rate with the fixed dirty predicate."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
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

    # real mixed rate with the FIXED dirty predicate, T in {8, 16}
    for t_win in (8, 16):
        lrn = Learner(cfg.replace(window=t_win), graph, split,
                      prefetch=False)
        lrn.run(1000)
        s0 = int(lrn.state.step_count); t0 = time.time()
        lrn.run(8000)
        dt = time.time() - t0
        assert int(lrn.state.step_count) - s0 == 8000
        print(f"# window-T{t_win} (fixed predicate): "
              f"{8000/dt:.0f} updates/s", flush=True)
        lrn.close(); del lrn

    # forced-clean stage profile
    real = win_mod._dirty_windows
    win_mod._dirty_windows = (
        lambda nodes, mask, nbrs, tw:
        jnp.zeros((nodes.shape[0],), bool))
    try:
        lrn = Learner(cfg.replace(window=8), graph, split,
                      prefetch=False)
        print("### stage profile window-T8 FORCED-CLEAN", flush=True)
        lrn.print_stage_profile(iters=2000)
        lrn.close()
    finally:
        win_mod._dirty_windows = real


if __name__ == "__main__":
    main()
