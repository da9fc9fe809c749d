"""Window-size sensitivity on the heavy-tailed (com-DBLP-shaped)
power-law surrogate.

On the near-regular bench graph max_fan_out=23 gives B_cap=33 lanes
and T=12 is optimal. The power-law surrogate has max_fan_out~304, so
EVERY batch pads to B_cap=305 lanes and the window engine's
collision-correction one-hots are [B+n, T*B] = [337, 12*305] per
step — the T*B staged-row contraction scales with the HUB degree, not
the average. bench.py round-3 measured 360 updates/s at window=12
here (vs 99k on the regular graph): this pins the curve so the auto
policy can scale T with B_cap.

Run alone on the real TPU: python scripts/exp_powerlaw_window.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_single  # noqa: E402


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
                  steps_per_call=996, device_sampling=True,
                  shared_neighbors=True,
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s: N={base.N} "
          f"E={base.E} max_fan_out={base.max_fan_out} "
          f"b_cap={base.max_batch_nodes}", flush=True)

    r = {}
    for w in (0, 2, 4, 12):
        label = f"w{w}"
        cfg = base.replace(window=w)
        iters = 4980 if w else 4980
        try:
            r[label] = measure_single(cfg, graph, split, label,
                                      iters=iters, trials=2)
        except Exception as e:
            print(f"# [{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(45)

    print("# ==== summary ====", flush=True)
    for key, val in r.items():
        print(f"# {key}: {val:.0f}", flush=True)


if __name__ == "__main__":
    main()
