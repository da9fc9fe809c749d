"""Fresh fused-stage profile of the current bench configuration.

Prints the trace-based per-stage table (device-sampled, shared
neighbors, spc as given) plus the module wall, to direct the next perf
bite. Usage:
    python scripts/exp_profile_now.py [spc [K [pi_dtype]]] [noprof]
``noprof`` (any position) skips the trace table, leaving the fenced
wall rate only.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import sys
import time

from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.learner import Learner


def main():
    args = [a for a in sys.argv[1:] if a != "noprof"]
    noprof = len(args) != len(sys.argv) - 1
    spc = int(args[0]) if len(args) > 0 else 1000
    k = int(args[1]) if len(args) > 1 else 256
    pi_dtype = args[2] if len(args) > 2 else "float32"
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=k, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=spc, device_sampling=True,
                 shared_neighbors=True, pi_dtype=pi_dtype,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    learner = Learner(cfg, graph, split)
    learner.run(cfg.steps_per_call)
    # wall rate first (fenced)
    s0 = int(learner.state.step_count)
    t0 = time.time()
    learner.run(10_000)
    steps = int(learner.state.step_count) - s0
    dt = time.time() - t0
    print(f"# wall: {steps/dt:.0f} updates/s "
          f"({dt/steps*1e6:.2f} us/step)", flush=True)
    if not noprof:
        learner.print_stage_profile(iters=4 * spc)
    learner.close()


if __name__ == "__main__":
    main()
