"""Windowed multi-chain aggregate sweep (round 3).

The windowed mega-kernel (ops/window.py) took single-chain 53.5-55.8k
-> 66.6-70.6k updates/s at T=12. This sweep measures the chain
generalization (chains_flat.py::_windowed_chain_scan — T steps x C
chains = T*C virtual steps per pallas_call) on the bench graph to find
the new aggregate peak. Prior unwindowed curve: C=4 75.3k, C=8 72.2k,
C=16 52.2k (cliff: scatter per-row cost doubles once pi spans 5.2GB).

Run on the real TPU (exclusively):
  python scripts/exp_chain_window.py [C,T [C,T ...]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.chains_flat import FlatChainLearner

    combos = [(4, 12), (8, 12), (16, 6)]
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(",")) for a in
                  sys.argv[1:]]
    pi_dtype = os.environ.get("CW_PI_DTYPE", "float32")

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=504, device_sampling=True,
                  shared_neighbors=True, pi_dtype=pi_dtype,
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    for c, t_win in combos:
        cfg = base.replace(window=t_win,
                           steps_per_call=(504 // t_win) * t_win)
        lrn = FlatChainLearner(cfg, graph, split, num_chains=c)
        t0 = time.time()
        lrn.run(cfg.steps_per_call)           # compile + warm
        print(f"# C={c} T={t_win} warmup {time.time()-t0:.1f}s",
              flush=True)
        s0 = int(lrn.state.step_count)
        t0 = time.time()
        lrn.run(2016)
        steps = int(lrn.state.step_count) - s0
        dt = time.time() - t0
        print(f"# C={c} T={t_win}: {steps} steps in {dt:.2f}s -> "
              f"{steps/dt:.0f} steps/s = {c*steps/dt:.0f} aggregate "
              f"updates/s ({dt/steps*1e6:.1f} us/step wall)",
              flush=True)
        if os.environ.get("CW_PROFILE"):
            print(f"### stage profile C={c} T={t_win}", flush=True)
            lrn.print_stage_profile(iters=cfg.steps_per_call)
        del lrn
        time.sleep(2)


if __name__ == "__main__":
    main()
