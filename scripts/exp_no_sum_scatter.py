"""Experiment: production train loop with the phi_sum scatter skipped.

exp_scatter.py isolated the [B] -> [N] scalar scatter at ~5 us/step —
a third of the 15.3 us device wall. This hack patches scatter_rows to
drop that scatter (numerically WRONG — phi_sum goes stale — but the
program shape matches the planned phi-storage refactor, which makes
phi_sum a gather-time row reduction instead of carried state). If the
rate moves as predicted, the refactor is worth its blast radius.
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
from mcmc_ammsb_tpu.ops import phi as phi_ops
import jax.numpy as jnp

SKIP = "--skip-sum-scatter" in sys.argv

if SKIP:
    def scatter_rows(pi, phi_sum, nodes, node_mask, pi_rows, sums):
        safe = jnp.where(node_mask, nodes, pi.shape[0])
        pi = pi.at[safe].set(pi_rows, mode="drop")
        # phi_sum intentionally left stale; consume sums so it's not DCE'd
        return pi, phi_sum + 0 * jnp.sum(sums)
    phi_ops.scatter_rows = scatter_rows


def main():
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=1000, device_sampling=True,
                 shared_neighbors=True,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    learner = Learner(cfg, graph, split)
    learner.run(cfg.steps_per_call)  # compile + warmup
    best = 0.0
    for trial in range(3):
        s0 = int(learner.state.step_count)
        t0 = time.time()
        learner.run(10_000)
        steps = int(learner.state.step_count) - s0
        dt = time.time() - t0
        assert steps == 10_000
        rate = steps / dt
        best = max(best, rate)
        print(f"# trial {trial}: {rate:.0f} updates/s", flush=True)
    print(f"skip_sum_scatter={SKIP} best={best:.0f} updates/s")
    learner.close()


if __name__ == "__main__":
    main()
