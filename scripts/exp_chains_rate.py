"""Aggregate multi-chain throughput of the flat engine at bench scale.

Measures fenced aggregate updates/s (C chains x steps/s) for the flat
chain engine, with and without the shared per-(step,chain) neighbor
draw, on the com-DBLP-scale synthetic graph at K=256, m=n=32 — the
bench headline shape. Usage:
    python scripts/exp_chains_rate.py [C] [spc] [K] [shared|private]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import sys
import time

from mcmc_ammsb_tpu.chains_flat import FlatChainLearner
from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spc = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    shared = (sys.argv[4] if len(sys.argv) > 4 else "shared") == "shared"
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=k, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=spc, shared_neighbors=shared,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    learner = FlatChainLearner(cfg, graph, split, num_chains=c)
    learner.run(spc)                    # warmup: compile + first chunk
    iters = 5000
    s0 = int(learner.state.step_count)
    t0 = time.time()
    learner.run(iters)
    steps = int(learner.state.step_count) - s0   # scalar-readback fence
    dt = time.time() - t0
    assert steps == iters, steps
    print(f"# C={c} K={k} {'shared' if shared else 'private'}: "
          f"{steps/dt:.0f} steps/s x {c} chains = "
          f"{c*steps/dt:.0f} aggregate updates/s "
          f"({dt/steps*1e6:.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()
