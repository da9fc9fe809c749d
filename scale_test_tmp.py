import time, numpy as np, jax
from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.learner import Learner

for nn in (100_000, 317_080, 1_000_000):
    n, u, v = synthetic_edges(num_nodes=nn, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=200)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)
    lrn = Learner(cfg, graph, split)
    lrn.run(400); _ = int(lrn.state.step_count)
    for t in range(2):
        s0 = int(lrn.state.step_count)
        t0=time.time(); lrn.run(6000)
        done = int(lrn.state.step_count) - s0   # fences execution
        dt=time.time()-t0
        assert done == 6000
        print(f"N={nn} trial{t}: {done/dt:.0f} updates/sec ({dt*1e6/done:.0f} us/step)", flush=True)
    lrn.close()
