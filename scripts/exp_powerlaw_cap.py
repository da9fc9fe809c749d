"""Degree-capped NodeLink (ds_link_cap) on heavy-tailed graphs.

The com-DBLP-shaped power-law surrogate (max degree ~304) forces every
device batch to hub-sized static buffers: B_cap=305 node lanes and
E_cap=304 edge lanes per step to serve an average-degree (~6.6) pivot —
the sequential scan runs at ~15.1k updates/s vs ~100k on the
near-regular bench graph, and the window engine regresses outright
(scripts/exp_powerlaw_window.py). ds_link_cap subsamples hub rows with
the Horvitz-Thompson reweight (ops/device_sampling.py), shrinking the
buffers to max(m, cap): this measures the rate ladder and the ppx
trajectory cost of the cap.

Phases (com-DBLP-shaped, N=317k, K=256, m=n=32):
  uncapped w0      — the exact-semantics baseline (~15.1k)
  cap64/cap32 w0   — capped sequential scan
  cap32 w12        — capped + window engine (b_cap back to 33: the
                     regime where T=12 is the measured optimum)
  cap32 w12 alt    — + stratified coin (the single-chain peak shape)
  ppx check        — capped vs uncapped held-out ppx after the same
                     step budget (the cap's statistical price)

Run alone on the real TPU: python scripts/exp_powerlaw_cap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_single  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import (Graph, generate_sets,
                                     synthetic_powerlaw_edges)
    from mcmc_ammsb_tpu.learner import Learner

    t0 = time.time()
    n, u, v = synthetic_powerlaw_edges(
        317_080, 6.6, exponent=2.7, max_degree=343,
        num_communities=256, intra_fraction=0.85, seed=5)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=6)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=1000, device_sampling=True,
                  shared_neighbors=True,
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s: N={base.N} "
          f"E={base.E} max_fan_out={base.max_fan_out} "
          f"b_cap={base.max_batch_nodes}", flush=True)

    runs = [
        ("uncapped-w0", base.replace(window=0)),
        ("cap64-w0", base.replace(window=0, ds_link_cap=64)),
        ("cap32-w0", base.replace(window=0, ds_link_cap=32)),
        ("cap32-w12", base.replace(window=12, ds_link_cap=32)),
        ("cap32-w12-alt", base.replace(window=12, ds_link_cap=32,
                                       node_coin="alternate",
                                       steps_per_call=996)),
    ]
    r = {}
    for label, cfg in runs:
        iters = cfg.steps_per_call * 5
        try:
            r[label] = measure_single(cfg, graph, split, label,
                                      iters=iters, trials=2)
        except Exception as e:
            print(f"# [{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(45)

    # statistical price of the cap: same step budget, same seeds,
    # capped vs uncapped held-out perplexity
    ppx = {}
    for label, cfg in (("uncapped", base.replace(window=0)),
                       ("cap32", base.replace(window=0, ds_link_cap=32))):
        lrn = Learner(cfg, graph, split, prefetch=False)
        p0 = lrn.heldout_perplexity()
        lrn.run(20_000)
        p1 = lrn.heldout_perplexity()
        lrn.close()
        ppx[label] = (float(p0), float(p1))
        print(f"# [ppx-{label}] {p0:.4f} -> {p1:.4f} after 20k steps",
              flush=True)

    print("# ==== summary ====", flush=True)
    for key, val in r.items():
        print(f"# {key}: {val:.0f} updates/s", flush=True)
    for key, (p0, p1) in ppx.items():
        print(f"# ppx {key}: {p0:.4f} -> {p1:.4f}", flush=True)


if __name__ == "__main__":
    main()
