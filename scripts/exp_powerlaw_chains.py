"""Multi-chain aggregate on the heavy-tailed surrogate with ds_link_cap.

The blocked chain window curve on the near-regular bench graph peaks
at C=16/T=6 alternate (137.3k aggregate). Heavy tails previously made
chains pointless (hub-sized buffers bound everything); with the degree
cap the chain engines run at cap-sized buffers, so this measures the
same curve on the com-DBLP-shaped power-law surrogate.

Run alone on the real TPU: python scripts/exp_powerlaw_chains.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_chains  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import (Graph, generate_sets,
                                     synthetic_powerlaw_edges)

    t0 = time.time()
    n, u, v = synthetic_powerlaw_edges(
        317_080, 6.6, exponent=2.7, max_degree=343,
        num_communities=256, intra_fraction=0.85, seed=5)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=6)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  device_sampling=True, shared_neighbors=True,
                  ds_link_cap=32, node_coin="alternate",
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s: N={base.N} "
          f"E={base.E} max_fan_out={base.max_fan_out} "
          f"e_cap={base.max_batch_edges}", flush=True)

    runs = [
        ("c4-t12", 4, base.replace(window=12, steps_per_call=996)),
        ("c8-t12", 8, base.replace(window=12, steps_per_call=996)),
        ("c16-t6", 16, base.replace(window=6, steps_per_call=996)),
    ]
    r = {}
    for label, c, cfg in runs:
        try:
            r[label] = measure_chains(cfg, graph, split, c, label,
                                      iters=3984, trials=2)
        except Exception as e:
            print(f"# [{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(45)

    print("# ==== summary ====", flush=True)
    for key, val in r.items():
        print(f"# {key}: {val:.0f} aggregate updates/s", flush=True)


if __name__ == "__main__":
    main()
