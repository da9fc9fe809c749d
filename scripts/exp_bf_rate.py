"""Measure the device-sampled BF family rate vs host sampling (TPU).

The round-4 device BF path (ops/device_sampling._bf_expand — exact
FIFO replay of /root/reference/mcmc/sample.cc:177-248) landed opt-in:
auto fast-defaults still route BF to host sampling because nobody had
measured the device rate. This script measures both paths at the bench
shape (N=317k, K=256, m=32, n=32) so the default can be decided on
numbers:

  - host BF  (device_sampling=False, pipelined host sampler threads,
    steps_per_call=200 — the CLI's host-path auto default)
  - device BF (device_sampling=True, fully fused, steps_per_call=1000)
  - same for BFLink / BFNonLink singles

Run ONLY on an idle machine (CLAUDE.md: host contention corrupts TPU
rates and compiles).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mcmc_ammsb_tpu.config import Config, EdgeSetBackend, SampleStrategy
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.learner import Learner


def measure(cfg, graph, split, label, iters, trials=3):
    learner = Learner(cfg, graph, split)
    t0 = time.time()
    learner.run(cfg.steps_per_call)
    int(learner.state.step_count)          # fence compile
    print(f"# [{label}] warmup (incl. compile): {time.time()-t0:.1f}s",
          flush=True)
    best = 0.0
    for trial in range(trials):
        s0 = int(learner.state.step_count)
        t0 = time.time()
        learner.run(iters)
        steps = int(learner.state.step_count) - s0   # fenced readback
        dt = time.time() - t0
        assert steps == iters, steps
        best = max(best, steps / dt)
        print(f"# [{label}] trial {trial}: {steps} in {dt:.2f}s "
              f"-> {steps/dt:.0f}/s", flush=True)
    ppx = learner.heldout_perplexity()
    learner.close()
    print(f"[{label}] best {best:.0f} updates/s  ppx {ppx:.4f}",
          flush=True)
    return best


def main():
    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  edgeset_backend=EdgeSetBackend.AUTO)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    results = {}
    for strat in (SampleStrategy.BF, SampleStrategy.BF_LINK,
                  SampleStrategy.BF_NON_LINK):
        # device path first (fused, steps_per_call=1000)
        dcfg = base.replace(strategy=strat, device_sampling=True,
                            steps_per_call=1000)
        dcfg = dcfg.finalize(n, split.total_edges, graph.max_fan_out)
        results[f"device:{strat.value}"] = measure(
            dcfg, graph, split, f"device:{strat.value}", 10_000)
        # host path: CLI auto default steps_per_call=200, pipelined
        hcfg = base.replace(strategy=strat, device_sampling=False,
                            steps_per_call=200)
        hcfg = hcfg.finalize(n, split.total_edges, graph.max_fan_out)
        # equal trial counts on both paths (ADVICE r4): a best-of
        # aggregator with asymmetric trials would bias the comparison
        # toward whichever path got more draws from the run spread.
        results[f"host:{strat.value}"] = measure(
            hcfg, graph, split, f"host:{strat.value}", 1000, trials=3)

    print("\n== summary ==")
    for k, r in results.items():
        print(f"{k:22s} {r:10.0f} updates/s")
    print("# note: par-level deltas (<~10%) are within the documented "
          "run-to-run spread (CLAUDE.md); only multi-x gaps like the "
          "BFLink 2.4x are decision-grade.")


if __name__ == "__main__":
    main()
