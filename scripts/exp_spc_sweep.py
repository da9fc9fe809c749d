"""Sweep steps_per_call on the bench config: how much of the
wall-vs-device gap (19.3 vs 16.0 us/step at spc=1000) does a deeper
scan recover, and where does compile time / memory push back?"""

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
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    for spc in (1000, 2000, 4000, 8000):
        cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                     steps_per_call=spc, device_sampling=True,
                     shared_neighbors=True,
                     edgeset_backend=EdgeSetBackend.AUTO)
        cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
        learner = Learner(cfg, graph, split)
        t0 = time.time()
        learner.run(spc)
        compile_s = time.time() - t0
        iters = max(10_000, 2 * spc)
        best = 0.0
        for _ in range(3):
            s0 = int(learner.state.step_count)
            t0 = time.time()
            learner.run(iters)
            steps = int(learner.state.step_count) - s0
            dt = time.time() - t0
            assert steps == iters
            best = max(best, steps / dt)
        print(f"spc={spc:5d}: {best:7.0f} updates/s "
              f"({1e6/best:6.2f} us/step; compile+warm {compile_s:.0f}s)",
              flush=True)
        learner.close()


if __name__ == "__main__":
    main()
