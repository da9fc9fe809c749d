"""Push the blocked-window chain curve past C=16.

The kernel's scoped-VMEM ceiling binds C*T <= ~96, so bigger C needs
smaller T. pi capacity: fp32 OOMs at C=32 (10.4 GB) AND at C=24
(7.8 GB pi + init/working buffers; measured RESOURCE_EXHAUSTED), so
every point past C=16 rides bf16 (the capacity lever doing exactly
its job). Points (bench graph, K=256, m=n=32, device-sampled, shared
draws, alternate coin, new sampler rounds):
  - C=24 T=4 bf16
  - C=32 T=3 bf16
  - C=16 T=6 bf16 (re-check bf16 par at the fp32 peak with all cuts)

Run alone on the real TPU: python scripts/exp_c24_c32.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_chains  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=504, device_sampling=True,
                  shared_neighbors=True, node_coin="alternate",
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    r = {}
    r["c24t4_bf16"] = measure_chains(
        base.replace(window=4, pi_dtype="bfloat16"), graph, split, 24,
        "c24-t4-bf16")
    r["c32t3_bf16"] = measure_chains(
        base.replace(window=3, pi_dtype="bfloat16"), graph, split, 32,
        "c32-t3-bf16", profile=True)
    r["c16t6_bf16"] = measure_chains(
        base.replace(window=6, pi_dtype="bfloat16"), graph, split, 16,
        "c16-t6-bf16")

    print("# ==== summary ====", flush=True)
    for k, v in r.items():
        print(f"# {k}: {v:.0f}", flush=True)


if __name__ == "__main__":
    main()
