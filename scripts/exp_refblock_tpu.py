"""Measure the bit-exact reference-RNG backend on the real TPU:
faithful per-draw while-loops (rng/reference.py) vs the block decoder
(rng/refblock.py, Config.ref_rng_block).

Round-4 context: the strictness ladder's bit-exact floor measured
291 updates/s at the bench shape (N=317k, K=256, m=n=32) — the phi
stage's K sequential ziggurat draws each carry a lax.while_loop region
(~10 us dispatch each). The block decoder generates one xorshift word
buffer per stage and resolves the rejection chains with pointer
doubling; tests/test_refblock.py pins bit-identical trajectories.

Methodology: CLAUDE.md timing discipline — warmup outside the timed
region, scalar step-count fencing, best of 3, idle machine.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from mcmc_ammsb_tpu.config import Config, RngBackend
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner

    t0 = time.time()
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    print(f"# dataset ready in {time.time()-t0:.1f}s", file=sys.stderr)

    def measure(block, iters=600, trials=3, spc=200):
        cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                     rng_backend=RngBackend.REFERENCE,
                     ref_rng_block=block, steps_per_call=spc)
        cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
        lrn = Learner(cfg, graph, split)
        t0 = time.time()
        lrn.run(spc)
        int(lrn.state.step_count)
        print(f"# block={block}: warmup (incl. compile) "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        best = 0.0
        for trial in range(trials):
            s0 = int(lrn.state.step_count)
            t0 = time.time()
            lrn.run(iters)
            steps = int(lrn.state.step_count) - s0
            dt = time.time() - t0
            assert steps == iters, steps
            best = max(best, steps / dt)
            print(f"# block={block} trial {trial}: {steps} in {dt:.2f}s "
                  f"-> {steps/dt:.0f}/s", file=sys.stderr)
        pi0 = float(lrn.state.pi[12345, 7])   # trajectory witness
        lrn.close()
        return best, pi0

    # identical total steps (200 warmup + 3x600) -> the pi witness must
    # match bit-for-bit across decoders on the REAL chip too
    loop_ups, pi_loop = measure(False)
    block_ups, pi_block = measure(True)
    assert pi_loop == pi_block, (pi_loop, pi_block)
    # deeper dispatches: the block decoder has no while regions, so
    # spc=1000 may pipeline better
    deep_ups, _ = measure(True, iters=3000, spc=1000)
    print(f"# trajectory witness pi[12345,7] matches: {pi_loop!r}",
          file=sys.stderr)
    print({"loop_ups": round(loop_ups, 1),
           "block_ups": round(block_ups, 1),
           "block_spc1000_ups": round(deep_ups, 1),
           "speedup": round(max(block_ups, deep_ups) / loop_ups, 2)})


if __name__ == "__main__":
    main()
