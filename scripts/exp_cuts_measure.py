"""Measure the round-3 structural cuts on the real TPU.

The three cuts (all golden-tested, committed before the tunnel went
down mid-round; docs/design.md "the sampling wall and the three
structural cuts"):
  1. structural node extraction (pivot-first lanes, no sort dedup)
  2. compact chain-kernel operands (VMEM iota expansion, no [T,C*E,C*B]
     HBM one-hots)
  3. stratified link/non-link coin (node_coin='alternate', opt-in)

Points measured (bench graph N=317k K=256 m=n=32, device-sampled,
shared draws):
  - single-chain sequential (window=0)
  - single-chain windowed T=12, coin random vs alternate
  - chains C=8 T=12, C=16 T=6, coin random; C=16 T=6 alternate
  - stage profile of windowed C=16 T=6

Run on the real TPU (exclusively):  python scripts/exp_cuts_measure.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure_single(cfg, graph, split, label, iters=10_000, trials=3):
    from mcmc_ammsb_tpu.learner import Learner

    lrn = Learner(cfg, graph, split, prefetch=False)
    t0 = time.time()
    lrn.run(cfg.steps_per_call)
    print(f"# [{label}] warmup: {time.time()-t0:.1f}s", flush=True)
    best = 0.0
    for tr in range(trials):
        s0 = int(lrn.state.step_count)
        t0 = time.time()
        lrn.run(iters)
        steps = int(lrn.state.step_count) - s0
        dt = time.time() - t0
        assert steps == iters, steps
        best = max(best, steps / dt)
        print(f"# [{label}] trial {tr}: {steps/dt:.0f} updates/s",
              flush=True)
    print(f"# [{label}] best {best:.0f} updates/s", flush=True)
    lrn.close()
    return best


def measure_chains(cfg, graph, split, c, label, iters=4032, trials=2,
                   profile=False):
    from mcmc_ammsb_tpu.chains_flat import FlatChainLearner

    lrn = FlatChainLearner(cfg, graph, split, num_chains=c)
    t0 = time.time()
    lrn.run(cfg.steps_per_call)
    print(f"# [{label}] warmup: {time.time()-t0:.1f}s", flush=True)
    best = 0.0
    for tr in range(trials):
        s0 = int(lrn.state.step_count)
        t0 = time.time()
        lrn.run(iters)
        steps = int(lrn.state.step_count) - s0
        dt = time.time() - t0
        assert steps == iters, steps
        best = max(best, c * steps / dt)
        print(f"# [{label}] trial {tr}: {c*steps/dt:.0f} aggregate "
              f"updates/s", flush=True)
    print(f"# [{label}] best {best:.0f} aggregate updates/s", flush=True)
    if profile:
        try:
            lrn.print_stage_profile()
        except Exception as e:
            print(f"# [{label}] profile failed: {e}", flush=True)
    return best


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=1000, device_sampling=True,
                  shared_neighbors=True,
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    results = {}
    results["seq"] = measure_single(
        base.replace(window=0), graph, split, "seq")
    results["t12"] = measure_single(
        base.replace(window=12, steps_per_call=996), graph, split,
        "t12-random")
    results["t12alt"] = measure_single(
        base.replace(window=12, steps_per_call=996,
                     node_coin="alternate"),
        graph, split, "t12-alternate")

    cbase = base.replace(steps_per_call=504)
    results["c8t12"] = measure_chains(
        cbase.replace(window=12), graph, split, 8, "c8-t12")
    results["c16t6"] = measure_chains(
        cbase.replace(window=6), graph, split, 16, "c16-t6",
        profile=True)
    results["c16t6alt"] = measure_chains(
        cbase.replace(window=6, node_coin="alternate"), graph, split,
        16, "c16-t6-alternate")

    print("# ==== summary ====", flush=True)
    for k, v in results.items():
        print(f"# {k}: {v:.0f}", flush=True)


if __name__ == "__main__":
    main()
