"""Diagnose the multi-chain aggregate cliff (VERDICT r2 weak #1).

Round-2 curve (docs/design.md): C=4 -> 75.3k aggregate updates/s,
C=8 -> 72.2k, C=16 -> 52.2k (REGRESSES). 1024 scattered rows/step at
C=16 is nowhere near a hardware limit; this experiment captures the
per-stage trace attribution at C=8 and C=16 to name the regressing
stage, plus wall rates, on the bench graph.

Run on the real TPU (exclusively):  python scripts/exp_chain_cliff.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.chains_flat import FlatChainLearner

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=500, device_sampling=True,
                 shared_neighbors=True,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    for c in (4, 32):
        lrn = FlatChainLearner(cfg, graph, split, num_chains=c)
        t0 = time.time()
        lrn.run(cfg.steps_per_call)           # compile + warm
        print(f"# C={c} warmup {time.time()-t0:.1f}s", flush=True)
        s0 = int(lrn.state.step_count)
        t0 = time.time()
        lrn.run(2000)
        steps = int(lrn.state.step_count) - s0
        dt = time.time() - t0
        assert steps == 2000, steps
        print(f"# C={c}: {steps} steps in {dt:.2f}s -> "
              f"{steps/dt:.0f} steps/s = {c*steps/dt:.0f} aggregate "
              f"updates/s ({dt/steps*1e6:.1f} us/step wall)", flush=True)
        print(f"### stage profile C={c}", flush=True)
        lrn.print_stage_profile(iters=1000)
        del lrn
        time.sleep(2)


if __name__ == "__main__":
    main()
