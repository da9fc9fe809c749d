"""Decompose the fused eval series' cost on the real chip.

The BASELINE metric is time-to-target held-out perplexity — evals ride
inside it. Round-3 packing took the interval=500 series from 3.5k to
16.3k updates/s on the bench graph, but the eval-inclusive powerlaw
rate (8.6k vs 15.1k train-only) says the eval path still eats ~40% at
interval=500. This script separates the remaining cost into:

  1. train-only rate (run, fenced)
  2. eval-inclusive rate at intervals {250, 500, 1000, 2000}
  3. the lone evaluator's steady cost (heldout_perplexity, fenced)
  4. per-dispatch host overhead (fence + packed transfer)

Methodology per CLAUDE.md: scalar-readback fencing, warm every program
(including each interval's distinct fused-eval program) before timing,
idle machine only.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=1000, device_sampling=True,
                 shared_neighbors=True, window=12,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    h = len(split.heldout_edges_u)
    print(f"# dataset {time.time()-t0:.1f}s: N={cfg.N} E={cfg.E} "
          f"heldout={h}", flush=True)

    l = Learner(cfg, graph, split)

    # --- 1. train-only rate ------------------------------------------------
    l.run(1000)
    int(l.state.step_count)                   # fence warmup/compile
    s0 = int(l.state.step_count)
    t0 = time.time()
    l.run(10_000)
    steps = int(l.state.step_count) - s0
    base_dt = time.time() - t0
    base = steps / base_dt
    print(f"train-only: {base:.0f} updates/s "
          f"({base_dt*1e6/steps:.1f} us/step)", flush=True)

    # --- 3. lone evaluator cost -------------------------------------------
    l.heldout_perplexity()                    # warm the ppx program
    t0 = time.time()
    for _ in range(10):
        l.heldout_perplexity()                # returns float: fenced
    ppx_dt = (time.time() - t0) / 10
    print(f"lone heldout_perplexity: {ppx_dt*1e3:.2f} ms/call "
          f"({h} heldout edges)", flush=True)

    # --- 4. empty-ish dispatch overhead: smallest chunk + fence ------------
    l.run(1)                                  # warm chunk(1)
    int(l.state.step_count)
    t0 = time.time()
    for _ in range(10):
        l.run(1)                              # run() fences internally
    d1 = (time.time() - t0) / 10
    print(f"1-step dispatch+fence: {d1*1e3:.2f} ms", flush=True)

    # --- 2. eval-inclusive rates -------------------------------------------
    # The production path: run_fused_eval_series floors dispatch
    # chunks at EVAL_CHUNK_FLOOR=8000 steps and pipelines readbacks
    # at depth 2. History (this script's earlier variants, measured):
    # per-field readbacks 3.5k; packed single transfer 16.3k; packed
    # + depth-2 pipelining at 1000-step chunks 29.9k; + the 8000-step
    # chunk floor 106k = par with train-only (interval=500, K=256).
    from mcmc_ammsb_tpu.learner import eval_series_call_steps

    for interval in (250, 500, 1000, 2000):
        per_call = eval_series_call_steps(cfg.steps_per_call, interval)
        list(l.run_with_ppx(per_call, interval))  # warm BOTH programs
        s0 = int(l.state.step_count)
        t0 = time.time()
        list(l.run_with_ppx(per_call, interval))
        dt = time.time() - t0
        steps = int(l.state.step_count) - s0
        rate = steps / dt
        n_evals = steps // interval
        overhead_ms = (dt - steps / base) * 1e3 / max(n_evals, 1)
        print(f"interval={interval} ({steps} steps, {n_evals} evals): "
              f"{rate:.0f} updates/s (+{overhead_ms:.2f} ms/eval over "
              f"train-only)", flush=True)

    l.close()


if __name__ == "__main__":
    main()
