"""Round-3 frontier sweep: bf16 big-C chains + windowed large-K ladder.

Two follow-ups once the structural cuts are measured:

  1. bf16 pi unlocks C>16 on one chip (fp32 C=32 OOMs at 10.4 GB;
     bf16 C=32 is 5.2 GB). The kernel's scoped-VMEM ceiling binds
     C*T (~96 at K=256), so bigger C runs shorter windows.
  2. The windowed engine has never been measured at K>=1024 — the
     post-factorization sequential ladder was K=1024 39.1k / 2048
     29.0k / 4096 18.4k, bound by scatter lowering + per-op overheads;
     the window kills the latter. VMEM binds (C*T*B rows) x K staged
     floats, so K=1024 runs T<=12, K=2048 T<=6, K=4096 T<=3.

Usage (real TPU, exclusively):
  python scripts/exp_frontier.py chains   # phase 1
  python scripts/exp_frontier.py kladder  # phase 2
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def dataset():
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)
    return n, split, graph


def base_cfg(n, split, graph, **kw):
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend

    kw.setdefault("K", 256)
    cfg = Config(mini_batch_size=32, num_node_sample=32,
                 steps_per_call=1000, device_sampling=True,
                 shared_neighbors=True,
                 edgeset_backend=EdgeSetBackend.AUTO, **kw)
    return cfg.finalize(n, split.total_edges, graph.max_fan_out)


def run_chains(cfg, graph, split, c, label, iters):
    from mcmc_ammsb_tpu.chains_flat import FlatChainLearner

    try:
        lrn = FlatChainLearner(cfg, graph, split, num_chains=c)
        t0 = time.time()
        lrn.run(cfg.steps_per_call)
        print(f"# [{label}] warmup: {time.time()-t0:.1f}s", flush=True)
        best = 0.0
        for tr in range(2):
            s0 = int(lrn.state.step_count)
            t0 = time.time()
            lrn.run(iters)
            steps = int(lrn.state.step_count) - s0
            dt = time.time() - t0
            assert steps == iters, steps
            best = max(best, c * steps / dt)
            print(f"# [{label}] trial {tr}: {c*steps/dt:.0f} aggregate",
                  flush=True)
        print(f"# [{label}] best {best:.0f} aggregate updates/s",
              flush=True)
    except Exception as e:
        print(f"# [{label}] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def run_single(cfg, graph, split, label, iters):
    from mcmc_ammsb_tpu.learner import Learner

    try:
        lrn = Learner(cfg, graph, split, prefetch=False)
        t0 = time.time()
        lrn.run(cfg.steps_per_call)
        print(f"# [{label}] warmup: {time.time()-t0:.1f}s", flush=True)
        best = 0.0
        for tr in range(2):
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
    except Exception as e:
        print(f"# [{label}] FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "chains"
    n, split, graph = dataset()

    if phase == "chains":
        for c, t_win in [(24, 4), (32, 3)]:
            spc = (504 // t_win) * t_win
            cfg = base_cfg(n, split, graph, pi_dtype="bfloat16",
                           window=t_win, steps_per_call=spc)
            run_chains(cfg, graph, split, c,
                       f"c{c}-t{t_win}-bf16", iters=spc * 4)
    elif phase == "kladder":
        for k, t_win in [(1024, 12), (2048, 6), (4096, 3)]:
            spc = (996 // t_win) * t_win
            cfg = base_cfg(n, split, graph, K=k, window=t_win,
                           steps_per_call=spc)
            run_single(cfg, graph, split, f"k{k}-t{t_win}",
                       iters=spc * 5)
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
