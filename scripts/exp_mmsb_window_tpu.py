"""Measure the windowed MMSB mega-kernel on the real TPU.

Round-3 context (docs/design.md "windowed MMSB"): the jnp window twin
bought nothing for MMSB (70.1k vs 71.1k sequential at a-MMSB shapes) —
the window's win is the Pallas kernel replacing T steps' worth of XLA
per-op overheads, so MMSB needed its own [K,K]-theta kernel
(ops/window_mmsb.py, round 3 late). This script produces the first
real-chip numbers for it: sequential vs T in {6, 12} at the bench MMSB
shape (N=317k, K=64, m=n=32, alternate coin).

Methodology: CLAUDE.md timing discipline — warmup outside the timed
region, scalar step-count fencing, best of 3 trials, idle machine.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from mcmc_ammsb_tpu.config import Config
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.models.mmsb import FullMMSBLearner
    from mcmc_ammsb_tpu.ops.window_mmsb import (
        mmsb_max_safe_window, mmsb_window_working_set_bytes)

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    print(f"# dataset ready in {time.time()-t0:.1f}s", file=sys.stderr)

    def measure(window, iters=10_000, trials=3):
        cfg = Config(K=64, mini_batch_size=32, num_node_sample=32,
                     steps_per_call=1000, device_sampling=True,
                     shared_neighbors=True, node_coin="alternate",
                     window=window)
        cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
        if window > 1:
            ws = mmsb_window_working_set_bytes(
                cfg.K, window, cfg.max_batch_nodes,
                cfg.num_node_sample, cfg.max_batch_edges)
            safe = mmsb_max_safe_window(cfg, (window,))
            print(f"# window={window}: working set {ws/2**20:.1f} MiB, "
                  f"safe={safe == window}", file=sys.stderr)
            if safe != window:
                print(f"# window={window} over the envelope; skipped",
                      file=sys.stderr)
                return None
        lrn = FullMMSBLearner(cfg, graph, split)
        t0 = time.time()
        lrn.run(cfg.steps_per_call)
        print(f"# window={window}: warmup (incl. compile) "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        best = 0.0
        for trial in range(trials):
            s0 = int(lrn.state.step_count)
            t0 = time.time()
            lrn.run(iters)
            steps = int(lrn.state.step_count) - s0  # fenced readback
            dt = time.time() - t0
            assert steps == iters, steps
            best = max(best, steps / dt)
            print(f"# window={window} trial {trial}: {steps/dt:.0f}/s",
                  file=sys.stderr)
        ppx = lrn.heldout_perplexity()
        print(f"window={window}: best {best:.0f} updates/s "
              f"(ppx {ppx:.4f})")
        return best

    seq = measure(0)
    for t in (6, 12):
        w = measure(t)
        if w and seq:
            print(f"window={t} speedup vs sequential: {w/seq:.2f}x")


if __name__ == "__main__":
    main()
