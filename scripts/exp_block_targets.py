"""Prototype: NodeNonLink with BLOCK targets — scatter becomes a DUS.

The fused profile pins pi_scatter at ~6 us/step (38%) for 64 padded
rows: the TPU scatter costs ~91 ns/row marginal (exp_scatter_scaling)
vs ~27 ns/row for gathers, and batching does not amortize it. This
prototype changes WHERE the minibatch rows live instead: the NonLink
strategy's m uniform-random targets are drawn as ONE aligned
contiguous block (random-reshuffling style — offset = m * U[0, N/m)),
so the phi write-back of the block is a dynamic_update_slice (~free)
plus a single scattered pivot row. Gathers of the block are a
dynamic_slice too.

Statistical shape: each target node is still marginally uniform;
within-step targets are correlated (they always co-occur), the same
class of within-step correlation the edge minibatch (one pivot drives
the whole beta gradient) and shared_neighbors already have. Exclusion
redraws are replaced by masking + the count-aware 2E/m_eff weight
(exactly the device sampler's existing mechanism).

Measures updates/s of the prototype loop vs the production
NODE_NON_LINK device-sampled loop at the bench shape.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import functools
import sys
import time

import jax
import jax.numpy as jnp

from mcmc_ammsb_tpu.config import Config, EdgeSetBackend, SampleStrategy
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.learner import Learner
from mcmc_ammsb_tpu.ops import beta as beta_ops
from mcmc_ammsb_tpu.ops import phi as phi_ops
from mcmc_ammsb_tpu.ops.edgeset import build_edge_set
from mcmc_ammsb_tpu.ops.neighbor import sample_neighbors
from mcmc_ammsb_tpu.rng import native as native_rng

S = 1000
ITERS = 10_000


def measure_production(cfg, graph, split):
    learner = Learner(cfg, graph, split)
    learner.run(cfg.steps_per_call)
    best = 0.0
    for _ in range(3):
        s0 = int(learner.state.step_count)
        t0 = time.time()
        learner.run(ITERS)
        steps = int(learner.state.step_count) - s0
        dt = time.time() - t0
        assert steps == ITERS
        best = max(best, steps / dt)
    learner.close()
    return best


def build_block_loop(cfg, training_set, heldout_set):
    m = cfg.mini_batch_size
    n = cfg.num_node_sample
    K = cfg.K
    N = cfg.N
    n_blocks = N // m  # tail nodes beyond n_blocks*m are masked via v<N

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def run_chunk(state, tset, hset, s_len):
        pi, phi_sum, theta, beta, step0, beta_count0, keys = state
        k_piv, k_blk, k_nbr, k_phi, k_beta = keys
        steps = step0 + jnp.arange(s_len, dtype=jnp.int32)

        with jax.named_scope("device_sampling"):
            u = jax.vmap(lambda s: jax.random.randint(
                jax.random.fold_in(k_piv, s), (), 0, N, jnp.int32))(steps)
            o = jax.vmap(lambda s: jax.random.randint(
                jax.random.fold_in(k_blk, s), (), 0, n_blocks,
                jnp.int32))(steps) * m                          # [S]
            v = o[:, None] + jnp.arange(m, dtype=jnp.int32)     # [S, m]
            a = jnp.minimum(u[:, None], v)
            b = jnp.maximum(u[:, None], v)
            hit = tset.has_edges(a, b) | hset.has_edges(a, b)
            ok = (~hit) & (v != u[:, None]) & (v < N)           # [S, m]
            m_eff = jnp.sum(ok, axis=-1).astype(jnp.float32)
            weight = 2.0 * cfg.E / jnp.maximum(m_eff, 1.0)

        with jax.named_scope("neighbor_draws"):
            sentinel = jnp.full((1,), N, jnp.int32)
            nbrs = jax.vmap(lambda s: sample_neighbors(
                jax.random.fold_in(k_nbr, s), sentinel, N, n))(steps)

        nodes = jnp.concatenate([v, u[:, None]], axis=1)        # [S, m+1]
        with jax.named_scope("membership"):
            y_phi = tset.has_edges(nodes[:, :, None], nbrs)     # [S,m+1,n]
        with jax.named_scope("noise"):
            phi_noise = jax.vmap(lambda s: native_rng.randn(
                jax.random.fold_in(k_phi, s), (m + 1, K),
                pi.dtype))(steps)
            beta_noise = jax.vmap(lambda s: native_rng.randn(
                jax.random.fold_in(k_beta, s), (K, 2), pi.dtype))(steps)

        def body(c, xs):
            pi, phi_sum, theta, beta, step, beta_count = c
            u, o, vv, okk, w, nb, y_n, n_phi, n_beta, nds = xs
            with jax.named_scope("pi_gather"):
                blk = jax.lax.dynamic_slice(pi, (o, 0), (m, K))
                blk_s = jax.lax.dynamic_slice(phi_sum, (o,), (m,))
                piv = pi[u][None]
                piv_s = phi_sum[u][None]
                pi_n = jnp.concatenate([blk, piv], axis=0)      # [m+1, K]
                phis = jnp.concatenate([blk_s, piv_s], axis=0)
                pi_nb = pi[nb]                                  # [1, n, K]
            with jax.named_scope("phi_update"):
                nbr_mask = nb != nds[:, None]                   # [m+1, n]
                rows, sums = phi_ops.phi_update_core(
                    cfg, pi_n, phis, pi_nb, y_n, beta, step, n_phi,
                    nbr_mask)
            with jax.named_scope("pi_scatter"):
                lane_ok = jnp.concatenate(
                    [okk | False, jnp.ones((1,), jnp.bool_)])
                # invalid block lanes write back their original rows
                blk_new = jnp.where(lane_ok[:m, None], rows[:m], blk)
                sum_new = jnp.where(lane_ok[:m], sums[:m], blk_s)
                pi = jax.lax.dynamic_update_slice(pi, blk_new, (o, 0))
                phi_sum = jax.lax.dynamic_update_slice(phi_sum, sum_new,
                                                       (o,))
                pi = pi.at[u].set(rows[m])
                phi_sum = phi_sum.at[u].set(sums[m])
            beta_count = beta_count + 1
            with jax.named_scope("beta_grads"):
                eu = jnp.minimum(u, vv)
                ev = jnp.maximum(u, vv)
                grads = beta_ops.beta_gradients_core(
                    cfg, theta, beta, pi[eu], pi[ev],
                    jnp.zeros((m,), jnp.bool_), okk)
            with jax.named_scope("theta_update"):
                theta, beta = beta_ops.theta_step(
                    cfg, theta, grads, w, beta_count, n_beta)
            return (pi, phi_sum, theta, beta, step + 1, beta_count), None

        (pi, phi_sum, theta, beta, _, beta_count), _ = jax.lax.scan(
            body, (pi, phi_sum, theta, beta, step0, beta_count0),
            (u, o, v, ok, weight, nbrs, y_phi, phi_noise, beta_noise,
             nodes),
            unroll=cfg.scan_unroll)
        return (pi, phi_sum, theta, beta, step0 + s_len, beta_count,
                keys)

    return run_chunk


def main():
    n, u, v = synthetic_edges(num_nodes=317_080, avg_degree=7, seed=1)
    split = generate_sets(n, u, v, heldout_ratio=0.01, seed=2)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=256, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=S, device_sampling=True,
                 shared_neighbors=True,
                 strategy=SampleStrategy.NODE_NON_LINK,
                 edgeset_backend=EdgeSetBackend.AUTO)
    cfg = cfg.finalize(n, split.total_edges, graph.max_fan_out)

    base = measure_production(cfg, graph, split)
    print(f"# production NODE_NON_LINK device-sampled: {base:.0f} "
          "updates/s", flush=True)

    tset = build_edge_set(cfg.edgeset_backend, cfg.N, graph.edges_u,
                          graph.edges_v)
    hset = build_edge_set(cfg.edgeset_backend, cfg.N, split.heldout_u,
                          split.heldout_v)
    from mcmc_ammsb_tpu.learner import init_state
    st = init_state(cfg, 8)
    keys = (native_rng.key_from_seed((1, 2)),
            native_rng.key_from_seed((3, 4)),
            native_rng.key_from_seed((5, 6)),
            native_rng.key_from_seed((7, 8)),
            native_rng.key_from_seed((9, 10)))
    state = (st.pi, st.phi_sum, st.theta, st.beta,
             jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32), keys)
    run_chunk = build_block_loop(cfg, tset, hset)
    state = run_chunk(state, tset, hset, S)
    _ = int(state[4])  # fence
    best = 0.0
    for _ in range(3):
        s0 = int(state[4])
        t0 = time.time()
        for _ in range(ITERS // S):
            state = run_chunk(state, tset, hset, S)
        steps = int(state[4]) - s0
        dt = time.time() - t0
        assert steps == ITERS
        best = max(best, steps / dt)
    print(f"# block-target prototype: {best:.0f} updates/s")
    print(f"speedup: {best / base:.2f}x")

    if "--profile" in sys.argv:
        from mcmc_ammsb_tpu.utils import profiling
        holder = [state]

        def work():
            for _ in range(4):
                holder[0] = run_chunk(holder[0], tset, hset, S)
            _ = int(holder[0][4])
        prof = profiling.profile_trace(work)
        profiling.format_stage_table(prof, 4 * S, print)


if __name__ == "__main__":
    main()
