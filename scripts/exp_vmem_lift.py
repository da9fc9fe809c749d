"""Re-measure the chain-window ceiling after lifting the kernel's
scoped-VMEM budget (pltpu.CompilerParams(vmem_limit_bytes=100MiB);
the 16 MB default — sized for pipeline double-buffering the
single-invocation mega-kernel doesn't do — was the C*T<=96 binding
constraint; v5e has 128 MiB VMEM).

Points (bench graph, alternate coin, new sampler rounds):
  - C=16 T=12 fp32  (previously a scoped-vmem compile failure)
  - C=32 T=3  bf16  (previously 18.6M > 16M)
  - C=32 T=6  bf16

Run alone on the real TPU: python scripts/exp_vmem_lift.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from exp_cuts_measure import measure_chains  # noqa: E402


def main():
    from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = Config(K=256, mini_batch_size=32, num_node_sample=32,
                  steps_per_call=504, device_sampling=True,
                  shared_neighbors=True, node_coin="alternate",
                  edgeset_backend=EdgeSetBackend.AUTO)
    base = base.finalize(n, split.total_edges, graph.max_fan_out)
    print(f"# dataset ready in {time.time()-t0:.1f}s", flush=True)

    r = {}
    for label, c, t, dt in (("c16-t12-f32", 16, 12, "float32"),
                            ("c32-t3-bf16", 32, 3, "bfloat16"),
                            ("c32-t6-bf16", 32, 6, "bfloat16")):
        try:
            r[label] = measure_chains(
                base.replace(window=t, pi_dtype=dt), graph, split, c,
                label, profile=(label == "c32-t6-bf16"))
        except Exception as e:
            print(f"# [{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            time.sleep(45)   # let the compile helper settle

    print("# ==== summary ====", flush=True)
    for k, v in r.items():
        print(f"# {k}: {v:.0f}", flush=True)


if __name__ == "__main__":
    main()
