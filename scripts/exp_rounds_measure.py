"""Measure the sampler-rounds cut (Config.ds_link_rounds /
ds_nonlink_rounds) on the real TPU.

DS_NONLINK's cost is ~all in `bad_lanes` (2 edge-set membership passes
+ the [S,m,m] dup test), which runs rounds+1 times; the residual mask
+ 2E/m_eff reweight is unbiased at any rounds, so cutting 4 -> 1
(and link 6 -> 2) should cut DS_NONLINK ~2.5x with an unchanged
estimator. Points: single-chain T=12 alternate, C=16 T=6 alternate
(the round-3 aggregate peak), old rounds vs new defaults; profile at
the peak.

Run alone on the real TPU: python scripts/exp_rounds_measure.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_single, measure_chains  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=1000, device_sampling=True,
                  shared_neighbors=True, node_coin="alternate",
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    old = dict(ds_link_rounds=6, ds_nonlink_rounds=4)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    r = {}
    r["t12alt_old"] = measure_single(
        base.replace(window=12, steps_per_call=996, **old),
        graph, split, "t12-alt-oldrounds")
    r["t12alt_new"] = measure_single(
        base.replace(window=12, steps_per_call=996), graph, split,
        "t12-alt-newrounds")
    cbase = base.replace(steps_per_call=504)
    r["c16alt_old"] = measure_chains(
        cbase.replace(window=6, **old), graph, split, 16,
        "c16-t6-alt-oldrounds")
    r["c16alt_new"] = measure_chains(
        cbase.replace(window=6), graph, split, 16,
        "c16-t6-alt-newrounds", profile=True)

    print("# ==== summary ====", flush=True)
    for k, v in r.items():
        print(f"# {k}: {v:.0f}", flush=True)


if __name__ == "__main__":
    main()
