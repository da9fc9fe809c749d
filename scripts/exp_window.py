"""Measure the T-step windowed fused loop vs the sequential scan.

Bench shape (N=317k, K=256, m=n=32, device-sampled, shared draws,
spc=1000). Prints updates/s for the sequential engine and for
window T in {4, 8, 16} x impl in {pallas}, plus the dirty-window rate.

Run on the real TPU (exclusively):  python scripts/exp_window.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(cfg, graph, split, label, iters=10_000, trials=2):
    from mcmc_ammsb_tpu.learner import Learner

    lrn = Learner(cfg, graph, split, prefetch=False)
    t0 = time.time()
    lrn.run(cfg.steps_per_call)
    print(f"# [{label}] warmup (incl. compile): {time.time()-t0:.1f}s",
          flush=True)
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
    ppx = lrn.heldout_perplexity()
    print(f"# [{label}] best {best:.0f} updates/s, ppx {ppx:.4f}",
          flush=True)
    lrn.close()
    return best


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=1000, device_sampling=True,
                 shared_neighbors=True,
                 batch_nodes_cap=int(os.environ.get("EW_BCAP", "0")),
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    t_wins = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
              else [4, 8, 16])
    if os.environ.get("EW_SKIP_SEQ"):
        base = float(os.environ.get("EW_BASE", "58235"))
    else:
        base = measure(cfg, graph, split, "sequential")
    for t_win in t_wins:
        r = measure(cfg.replace(window=t_win), graph, split,
                    f"window-T{t_win}-pallas")
        print(f"# window T={t_win}: {r/base:.2f}x vs sequential",
              flush=True)


if __name__ == "__main__":
    main()
