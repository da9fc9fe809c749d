"""com-LiveJournal-scale training on one chip via ds_link_cap.

The reference's largest headline graph is com-LiveJournal (N=3,997,962,
E=34,681,189, avg degree ~17.3, max degree ~14,815 — BASELINE.md). Its
hub degree made the device-sampled NodeLink path unrunnable here:
static buffers of max(m, 14815) edge lanes per step mean every
gather/scatter moves ~15k rows to process an average-degree pivot, and
the AUTO membership budget rejects the N*max_degree adjacency matrix
(237 GB). With ds_link_cap (ops/device_sampling.py) the buffers shrink
to max(m, cap) and hub rows are Horvitz-Thompson subsampled, so the
full-scale graph trains at near-regular-graph rates.

Phases (LJ-shaped power-law surrogate, K=256, m=n=32):
  generate      — Chung-Lu surrogate matched to LJ's N/avg-deg/max-deg
  cap32-w0      — capped sequential scan rate
  cap32-w12     — capped windowed mega-kernel rate
  ppx sanity    — held-out perplexity falls over a short run

Memory: pi [4M, 256] fp32 = 4.1 GB + CSR cols ~230 MB (16 GB chip).
Run alone on the real TPU: python scripts/exp_lj_scale.py

Measured (idle chip, fenced; realized surrogate N=3,993,152
E=28,497,941 max_fan_out=3,099 — dedup of the 34.7M Chung-Lu draws
trims the tail below the 14.8k expected-degree target):
  generate 183s (vectorized group-by; the per-community python loop
  this replaced ran >25 min), split+CSR 84s
  cap32-w0   12,444 updates/s
  cap32-w12  29,484 updates/s   (pi is 4.1 GB: the >4 GB array knee
                                 roughly halves scatter/gather per-row
                                 rates vs the 317k-node graph, matching
                                 exp_chain_cliff.py's curve)
  ppx 22.4103 -> 18.8707 after 30k steps (K=256)
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
        3_997_962, 17.35, exponent=2.4, max_degree=14_815,
        num_communities=5000, intra_fraction=0.85, seed=11)
    print(f"# generated {len(u)} edges in {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    split = generate_sets(n, u, v, heldout_ratio=0.002, seed=12)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=1000, device_sampling=True,
                  shared_neighbors=True, ds_link_cap=32,
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# split+CSR in {time.time()-t0:.1f}s: N={base.N} "
          f"E={base.E} max_fan_out={base.max_fan_out} "
          f"e_cap={base.max_batch_edges} b_cap={base.max_batch_nodes}",
          flush=True)

    r = {}
    for label, cfg in (("cap32-w0", base.replace(window=0)),
                       ("cap32-w12", base.replace(window=12))):
        try:
            r[label] = measure_single(cfg, graph, split, label,
                                      iters=5000, trials=2)
        except Exception as e:
            print(f"# [{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(45)

    # convergence sanity at full scale
    lrn = Learner(base.replace(window=12), graph, split, prefetch=False)
    p0 = lrn.heldout_perplexity()
    lrn.run(30_000)
    p1 = lrn.heldout_perplexity()
    lrn.close()
    print(f"# ppx {p0:.4f} -> {p1:.4f} after 30k steps", flush=True)

    print("# ==== summary ====", flush=True)
    for key, val in r.items():
        print(f"# {key}: {val:.0f} updates/s", flush=True)


if __name__ == "__main__":
    main()
