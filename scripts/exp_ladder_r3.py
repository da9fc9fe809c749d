"""Re-measure the K ladder on the round-3-late fast path.

The round-2 ladder numbers (K=1024 39.1k, K=2048 29.0k, K=4096 18.4k)
predate the window engine, the structural cuts, the sampler-rounds
knob and the stratified coin. Large K is scatter-lowering-bound
(~326 ns/row at K=4096), so the relative win shrinks with K — this
pins the actual curve. Window stays at the T=12 single-chain optimum;
both coins measured (random = reference coin semantics).

Run alone on the real TPU: python scripts/exp_ladder_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_single  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    r = {}
    for k in (1024, 2048, 4096):
        base = Config(K=k, mini_batch_size=32, num_node_sample=32,
                      steps_per_call=996, device_sampling=True,
                      shared_neighbors=True, window=12,
                      edgeset_backend=EdgeSetBackend.AUTO)
        base = base.finalize(n, split.total_edges, graph.max_fan_out)
        iters = 10_000 if k <= 2048 else 5_000
        r[f"k{k}_random"] = measure_single(
            base, graph, split, f"k{k}-random", iters=iters)
        r[f"k{k}_alt"] = measure_single(
            base.replace(node_coin="alternate"), graph, split,
            f"k{k}-alternate", iters=iters)

    print("# ==== summary ====", flush=True)
    for key, val in r.items():
        print(f"# {key}: {val:.0f}", flush=True)


if __name__ == "__main__":
    main()
