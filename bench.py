"""Benchmark: minibatch phi+beta updates/sec (BASELINE.json metric).

Runs the fused SGRLD training loop on a com-DBLP-scale synthetic graph
(N=317k, E~1M — the real dataset cannot be fetched in this offline
image) with the config ladder's K=256, reference-default minibatch
m=32 / n=32 (/root/reference/mcmc/config.h:70-101), and reports
sustained phi+beta updates per second on the attached TPU.

The reference has no published numbers (BASELINE.md) — vs_baseline is
reported against a measured-elsewhere placeholder of None until a
reference run exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time


def main():
    import numpy as np

    from mcmc_ammsb_tpu.config import Config
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=100)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s: N={cfg.N} "
          f"E={cfg.E} max_fan_out={cfg.max_fan_out}", file=sys.stderr)

    learner = Learner(cfg, graph, split)
    # warmup: compile + first chunks
    t0 = time.time()
    learner.run(200)
    print(f"# warmup (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    iters = 2000
    t0 = time.time()
    learner.run(iters)
    dt = time.time() - t0
    ups = iters / dt

    ppx = learner.heldout_perplexity()
    learner.close()
    print(f"# {iters} updates in {dt:.2f}s; heldout ppx now {ppx:.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "minibatch phi+beta updates/sec (com-DBLP-scale synthetic, K=256, m=32, n=32)",
        "value": round(ups, 2),
        "unit": "updates/sec",
        "vs_baseline": None,
        "extra": {
            "N": cfg.N, "E": cfg.E, "K": cfg.K,
            "steps_per_call": cfg.steps_per_call,
            "seconds": round(dt, 3),
            "heldout_ppx": round(float(ppx), 4),
        },
    }))


if __name__ == "__main__":
    main()
