"""Flat-layout multi-chain engine: C independent SGRLD chains whose
state shares ONE row dimension — pi [C*N, K] with chain c's node u at
row c*N + u — so the hot scatter/gather of every step stays a plain
1-D-index operation (the vmap formulation in chains.py batches the
scatter, which lowers poorly on TPU; see docs/design.md).

Per step, all C chains' minibatches are processed as one [C*B]-node
flat batch: the phi stage is exactly ops.phi.phi_update_core with
per-chain beta rows broadcast in; the beta stage reduces per chain.
Aggregate statistical throughput approaches C x the single-chain rate
until bandwidth binds.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.data import DataSplit, Graph
from mcmc_ammsb_tpu.learner import init_state
from mcmc_ammsb_tpu.ops import beta as beta_ops
from mcmc_ammsb_tpu.ops import phi as phi_ops
from mcmc_ammsb_tpu.ops.device_sampling import sample_minibatches_device
from mcmc_ammsb_tpu.ops.edgeset import EdgeSet, build_edge_set
from mcmc_ammsb_tpu.ops.neighbor import sample_neighbors
from mcmc_ammsb_tpu.rng import native as native_rng
from mcmc_ammsb_tpu.utils.timing import StageTimers


class ChainState(NamedTuple):
    pi: jnp.ndarray            # [C*N, K]
    phi_sum: jnp.ndarray       # [C*N]
    theta: jnp.ndarray         # [C, K, 2]
    beta: jnp.ndarray          # [C, K]
    step_count: jnp.ndarray    # scalar (chains advance in lockstep)
    beta_count: jnp.ndarray
    ppx_per_edge: jnp.ndarray  # [C, H]
    ppx_count: jnp.ndarray
    phi_key: jax.Array
    beta_key: jax.Array
    neighbor_key: jax.Array
    sample_key: jax.Array


def _beta_gradients_chains(cfg: Config, theta, beta, pi_u, pi_v, y, mask):
    """Per-chain gradient fan-in: the math of
    ops.beta.beta_gradients_core with a leading chain axis.
    Shapes: theta [C,K,2], beta [C,K], pi_u/pi_v [C,E,K], y/mask [C,E].
    Returns [C,K,2]."""
    eps = cfg.epsilon
    theta_sum = theta[..., 0] + theta[..., 1]                # [C,K]
    yf = y.astype(pi_u.dtype)
    pp = pi_u * pi_v                                         # [C,E,K]
    pi_sum = jnp.sum(pp, axis=-1)                            # [C,E]
    probs = jnp.where(y[..., None], beta[:, None, :],
                      1.0 - beta[:, None, :]) * pp
    prob_0 = jnp.where(y, eps, 1.0 - eps) * (1.0 - pi_sum)
    probs_sum = jnp.sum(probs, axis=-1) + prob_0
    f = probs / probs_sum[..., None]                         # [C,E,K]
    inv_ts = 1.0 / theta_sum[:, None, :]                     # [C,1,K]
    g0 = f * ((1.0 - yf)[..., None] / theta[:, None, :, 0] - inv_ts)
    g1 = f * (yf[..., None] / theta[:, None, :, 1] - inv_ts)
    m = mask.astype(pi_u.dtype)[..., None]
    return jnp.stack([jnp.sum(g0 * m, axis=1),
                      jnp.sum(g1 * m, axis=1)], axis=-1)     # [C,K,2]


def _chunk(cfg: Config, num_chains: int, edge_set: EdgeSet,
           heldout_set: EdgeSet, adjacency, state: ChainState,
           num_steps: int) -> ChainState:
    """Advance all chains num_steps in one fused program."""
    c = num_chains
    n_rows = cfg.N
    e_cap, b_cap = cfg.max_batch_edges, cfg.max_batch_nodes
    s_len = num_steps
    k = cfg.K

    # one batched draw covers every (step, chain) minibatch
    chunk_key = jax.random.fold_in(state.sample_key, state.step_count)
    with jax.named_scope("device_sampling"):
        ds = sample_minibatches_device(cfg, edge_set, heldout_set,
                                       chunk_key, s_len * c, adjacency,
                                       alt_period=c)

    def r(x, cap):
        return x.reshape(s_len, c, cap, *x.shape[2:])

    nodes = r(ds.nodes, b_cap)           # [S,C,B] (sentinel = N)
    node_mask = r(ds.node_mask, b_cap)
    eu = r(ds.edges_u, e_cap)
    ev = r(ds.edges_v, e_cap)
    emask = r(ds.edge_mask, e_cap)
    weight = ds.weight.reshape(s_len, c)

    steps = state.step_count + jnp.arange(s_len, dtype=jnp.int32)
    flat_nodes_all = nodes.reshape(s_len, c * b_cap)
    nbr_keys = jax.vmap(
        lambda s: jax.random.fold_in(state.neighbor_key, s))(steps)
    if cfg.shared_neighbors:
        # ONE n-draw per (step, chain): each chain keeps its own
        # independent stream (sharing across chains would correlate
        # the chains and void the R-hat diagnostics), but within a
        # chain every minibatch node reads the same neighbor set —
        # the same unbiased-per-node estimator as the single-chain
        # fast path (config.py shared_neighbors doc), cutting the
        # dominant pi_nb gather from C*B*n to C*n rows per step.
        sentinel = jnp.full((c,), cfg.N, jnp.int32)
        with jax.named_scope("neighbor_draws"):
            neighbors = jax.vmap(lambda key: sample_neighbors(
                key, sentinel, cfg.N, cfg.num_node_sample))(nbr_keys)
            # [S, C, n] chain-local ids
        with jax.named_scope("membership"):
            y_phi = edge_set.has_edges(
                nodes[..., None], neighbors[:, :, None, :])  # [S,C,B,n]
        nbr_mask = (neighbors[:, :, None, :]
                    != nodes[..., None])                      # [S,C,B,n]
        # beta endpoint rows come from the step's STAGED phi rows (the
        # edge_lanes trick of learner.train_steps_scan): endpoints are
        # a subset of the chain's deduped node lanes by construction
        lanes_u = jnp.argmax(eu[..., None] == nodes[:, :, None, :],
                             axis=-1).astype(jnp.int32)       # [S,C,E]
        lanes_v = jnp.argmax(ev[..., None] == nodes[:, :, None, :],
                             axis=-1).astype(jnp.int32)
    else:
        with jax.named_scope("neighbor_draws"):
            neighbors = jax.vmap(lambda key, nd: sample_neighbors(
                key, nd, cfg.N, cfg.num_node_sample))(
                nbr_keys, flat_nodes_all)     # [S, C*B, n]
        with jax.named_scope("membership"):
            y_phi = edge_set.has_edges(flat_nodes_all[:, :, None],
                                       neighbors)
        nbr_mask = jnp.zeros((s_len,), jnp.bool_)   # unused placeholder
        lanes_u = lanes_v = jnp.zeros((s_len,), jnp.int32)
    with jax.named_scope("noise"):
        if cfg.phi_disable_noise:
            phi_noise = jnp.ones((s_len, c * b_cap, k), jnp.float32)
        else:
            phi_noise = jax.vmap(lambda s: native_rng.randn(
                jax.random.fold_in(state.phi_key, s),
                (c * b_cap, k)))(steps)
        beta_noise = jax.vmap(lambda s: native_rng.randn(
            jax.random.fold_in(state.beta_key, s), (c, k, 2)))(steps)
    with jax.named_scope("membership"):
        y_edges = edge_set.has_edges(eu, ev)   # [S,C,E]

    # chain row offsets; sentinel rows (id == N) map to the global
    # sentinel C*N so they never collide with another chain's row 0
    offsets = (jnp.arange(c, dtype=jnp.int32) * n_rows)[:, None]  # [C,1]

    def body(st: ChainState, xs):
        (nodes_s, nmask_s, eu_s, ev_s, emask_s, w_s,
         nbrs_s, y_n, n_phi, n_beta, y_e, nm_s, lu_s, lv_s) = xs
        # ---- phi stage over the flat [C*B] node batch ----------------
        flat_nodes = jnp.where(nodes_s < n_rows, nodes_s + offsets,
                               c * n_rows).reshape(-1)       # [C*B]
        flat_mask = nmask_s.reshape(-1)
        with jax.named_scope("pi_gather"):
            # bf16 pi storage: gathered rows upcast, compute stays fp32
            # (the single-chip discipline, learner.py pi_storage_dtype)
            pi_n = st.pi[flat_nodes].astype(jnp.float32)     # [C*B, K]
            phis = st.phi_sum[flat_nodes]
            if cfg.shared_neighbors:
                pi_nb = st.pi[nbrs_s + offsets].astype(
                    jnp.float32)                             # [C, n, K]
            else:
                flat_nbrs = (nbrs_s.reshape(c, b_cap, -1)
                             + offsets[:, :, None]).reshape(c * b_cap, -1)
                pi_nb = st.pi[flat_nbrs].astype(
                    jnp.float32)                             # [C*B, n, K]
        with jax.named_scope("phi_update"):
            if cfg.shared_neighbors:
                rows_c, sums_c = jax.vmap(
                    lambda pn, ps, pnb, yy, bt, nz, nm:
                    phi_ops.phi_update_core(cfg, pn, ps, pnb[None], yy,
                                            bt, st.step_count, nz, nm)
                )(pi_n.reshape(c, b_cap, k), phis.reshape(c, b_cap),
                  pi_nb, y_n, st.beta, n_phi.reshape(c, b_cap, k), nm_s)
                rows = rows_c.reshape(c * b_cap, k)
                sums = sums_c.reshape(-1)
            else:
                beta_rows = jnp.repeat(st.beta, b_cap, axis=0)[:, None, :]
                rows, sums = phi_ops.phi_update_core(
                    cfg, pi_n, phis, pi_nb, y_n.reshape(c * b_cap, -1),
                    beta_rows, st.step_count, n_phi)
        with jax.named_scope("pi_scatter"):
            safe = jnp.where(flat_mask, flat_nodes, c * n_rows)
            pi = st.pi.at[safe].set(rows.astype(st.pi.dtype),
                                    mode="drop")
            phi_sum = st.phi_sum.at[safe].set(sums, mode="drop")
        # ---- beta stage per chain ------------------------------------
        with jax.named_scope("beta_grads"):
            if cfg.shared_neighbors:
                # endpoint rows from the staged buffer (no [C*N,K]
                # gathers); masked node lanes hold staging garbage the
                # scatter drops — sanitize before the small lane
                # gathers (NaN*0 != 0)
                rows_safe = jnp.where(flat_mask[:, None], rows,
                                      1.0 / k).reshape(c, b_cap, k)
                pi_u = jnp.take_along_axis(rows_safe, lu_s[..., None],
                                           axis=1)
                pi_v = jnp.take_along_axis(rows_safe, lv_s[..., None],
                                           axis=1)
            else:
                flat_eu = (eu_s + offsets).reshape(-1)
                flat_ev = (ev_s + offsets).reshape(-1)
                pi_u = pi[flat_eu].astype(jnp.float32).reshape(
                    c, e_cap, k)
                pi_v = pi[flat_ev].astype(jnp.float32).reshape(
                    c, e_cap, k)
            grads = _beta_gradients_chains(
                cfg, st.theta, st.beta, pi_u, pi_v, y_e, emask_s)
        beta_count = st.beta_count + 1
        with jax.named_scope("theta_update"):
            theta, beta = beta_ops.theta_step(
                cfg, st.theta, grads, w_s[:, None, None], beta_count,
                n_beta)
        return st._replace(
            pi=pi, phi_sum=phi_sum, theta=theta, beta=beta,
            step_count=st.step_count + 1, beta_count=beta_count), None

    xs = (nodes, node_mask, eu, ev, emask, weight, neighbors, y_phi,
          phi_noise, beta_noise, y_edges, nbr_mask, lanes_u, lanes_v)
    if cfg.window > 1 and cfg.shared_neighbors:
        return _windowed_chain_scan(cfg, c, state, xs, body)
    state, _ = jax.lax.scan(body, state, xs, unroll=cfg.scan_unroll)
    return state


def _windowed_chain_scan(cfg: Config, num_chains: int,
                         state: ChainState, xs, body) -> ChainState:
    """T-step windowed multi-chain scan: each window runs ONE bulk
    gather + ONE mega-kernel call (ops/window.py) + ONE last-write-wins
    scatter in place of T*C scan-body iterations. Chains are BLOCKED
    inside each kernel step — all C chains' minibatches stack into
    [C*B, K] row blocks with block-diagonal pair masks and
    chain-offset edge one-hots, so per-step matmuls are MXU-sized
    instead of C serialized small ones (the serialized virtual-step
    formulation measured 0.7x the UNwindowed engine; docs/design.md
    round 3). Chain c's flat row ids are disjoint from every other
    chain's, so intra-window collision corrections stay per-chain
    ([B+n, T*B] one-hots against chain-major staged blocks, linear in
    C). Per-chain theta/beta ride the kernel component-major as
    [2C, K]/[C, K]. Any non-multiple tail runs through the sequential
    ``body``. Trajectory semantics are exactly the sequential chain
    scan's (golden-tested, test_chains_flat.py)."""
    from mcmc_ammsb_tpu.ops.window import (_correction_codes,
                                           _last_write_wins,
                                           window_kernel_call)

    t_win = cfg.window
    c = num_chains
    s_len = xs[0].shape[0]
    n_win = s_len // t_win
    tail = s_len - n_win * t_win
    if n_win == 0:
        state, _ = jax.lax.scan(body, state, xs, unroll=cfg.scan_unroll)
        return state

    b_cap, e_cap, k = (cfg.max_batch_nodes, cfg.max_batch_edges, cfg.K)
    n_nbr = cfg.num_node_sample
    n_rows = cfg.N
    f32 = jnp.float32
    xs_w = jax.tree.map(
        lambda a: a[: n_win * t_win].reshape(n_win, t_win, *a.shape[1:]),
        xs)

    def wbody(st: ChainState, xw):
        (nodes, nmask, eu_s, ev_s, emask_s, wts, nbrs, y_n, n_phi,
         n_beta, y_e, nm, lu, lv) = xw
        offsets = (jnp.arange(c, dtype=jnp.int32) * n_rows)[None, :,
                                                            None]
        nodes_f = jnp.where(nodes < n_rows, nodes + offsets,
                            c * n_rows)                   # [T, C, B]
        flat_nodes = nodes_f.reshape(t_win, c * b_cap)
        vmask = nmask.reshape(t_win, c * b_cap)
        nbrs_f = nbrs + offsets                           # [T, C, n]
        flat_nbrs = nbrs_f.reshape(t_win, c * n_nbr)
        with jax.named_scope("window_gather"):
            read_idx = jnp.concatenate([flat_nodes, flat_nbrs], axis=1)
            g = st.pi[read_idx.reshape(-1)].astype(f32).reshape(
                t_win, c * (b_cap + n_nbr), k)
            sums_g = st.phi_sum[flat_nodes.reshape(-1)].reshape(
                t_win, c * b_cap)
        with jax.named_scope("window_correct"):
            # per-chain staged-slot codes (chains never cross-collide):
            # [C, T, B+n, 1] with slots local to the chain's [T*B] block
            mcode_c = jax.vmap(
                partial(_correction_codes, cfg),
                in_axes=(1, 1, 1))(nodes_f, nmask, nbrs_f)
            mc_n = jnp.swapaxes(mcode_c[:, :, :b_cap], 0, 1).reshape(
                t_win, c * b_cap, 1)
            mc_b = jnp.swapaxes(mcode_c[:, :, b_cap:], 0, 1).reshape(
                t_win, c * n_nbr, 1)
            mcode = jnp.concatenate([mc_n, mc_b], axis=1)
        with jax.named_scope("window_prep"):
            lane_off = (jnp.arange(c, dtype=jnp.int32)
                        * b_cap)[None, :, None]
            lu_f = (lu + lane_off).reshape(t_win, c * e_cap)
            lv_f = (lv + lane_off).reshape(t_win, c * e_cap)
            steps = st.step_count + jnp.arange(t_win, dtype=jnp.int32)
            counts = (st.beta_count + 1
                      + jnp.arange(t_win, dtype=jnp.int32))
            theta_cb = jnp.moveaxis(st.theta, 2, 0).reshape(2 * c, k)
            args = dict(
                g=g,
                sums=sums_g[..., None].astype(f32),
                # compact per-chain pair tensors; the kernel expands
                # them block-diagonally in VMEM
                yf=y_n.reshape(t_win, c * b_cap, n_nbr).astype(f32),
                mf=nm.reshape(t_win, c * b_cap, n_nbr).astype(f32),
                nmask=vmask[..., None].astype(f32),
                noise=n_phi.astype(f32),           # [T, C*B, K]
                bnoise=jnp.moveaxis(n_beta, 3, 1).reshape(
                    t_win, 2 * c, k).astype(f32),
                yef=y_e.reshape(t_win, c * e_cap)[..., None].astype(
                    f32),
                emf=emask_s.reshape(t_win, c * e_cap)[..., None]
                .astype(f32),
                lanes_u=lu_f[..., None], lanes_v=lv_f[..., None],
                mcode=mcode,
                wts=wts[..., None].astype(f32),    # [T, C, 1]
                eps_phi=cfg.eps_t(steps).astype(f32)[:, None],
                eps_theta=cfg.eps_t(counts).astype(f32)[:, None],
                theta_cb=theta_cb, beta_cb=st.beta,
            )
        if cfg.window_impl == "jnp":
            rows, sums_col, theta_cb2, beta_cb2 = _windowed_chain_jnp(
                cfg, c, st, **args)
        else:
            with jax.named_scope("window_kernel"):
                rows, sums_col, theta_cb2, beta_cb2 = (
                    window_kernel_call(cfg, c, **args))
        with jax.named_scope("window_scatter"):
            # staged rows are CHAIN-major [C, T, B]; match the indices
            nodes_cm = jnp.swapaxes(nodes_f, 0, 1)        # [C, T, B]
            keep = jax.vmap(_last_write_wins, in_axes=(0, 1, None))(
                nodes_cm, nmask, t_win)                   # [C, T, B]
            safe = jnp.where(keep.reshape(-1),
                             nodes_cm.reshape(-1), c * n_rows)
            pi = st.pi.at[safe].set(rows.astype(st.pi.dtype),
                                    mode="drop")
            phi_sum = st.phi_sum.at[safe].set(sums_col[:, 0],
                                              mode="drop")
        theta_new = jnp.moveaxis(theta_cb2.reshape(2, c, k), 0, 2)
        return st._replace(
            pi=pi, phi_sum=phi_sum, theta=theta_new, beta=beta_cb2,
            step_count=st.step_count + t_win,
            beta_count=st.beta_count + t_win), None

    state, _ = jax.lax.scan(wbody, state, xs_w)
    if tail:
        xs_tail = jax.tree.map(lambda a: a[n_win * t_win:], xs)
        state, _ = jax.lax.scan(body, state, xs_tail,
                                unroll=cfg.scan_unroll)
    return state


def _windowed_chain_jnp(cfg: Config, num_chains: int, st: ChainState,
                        g, sums, yf, mf, nmask, noise, bnoise, yef,
                        emf, lanes_u, lanes_v, mcode, wts, eps_phi,
                        eps_theta, theta_cb, beta_cb):
    """jnp twin of the blocked chain mega-kernel (golden cross-check
    schedule): the same T-step window through the stock cores, chain
    by chain, against chain-major staged buffers."""
    t_win, _, k = g.shape
    c = num_chains
    b_cap = sums.shape[1] // c
    e_cap = yef.shape[1] // c
    cb = c * b_cap
    n_nbr = (g.shape[1] - cb) // c
    lin = jnp.arange(t_win * b_cap, dtype=jnp.int32)
    thetas = [jnp.moveaxis(
        theta_cb.reshape(2, c, k)[:, ci], 0, 1) for ci in range(c)]
    betas = [beta_cb[ci] for ci in range(c)]                # [K]
    rows_buf = jnp.zeros((c * t_win * b_cap, k), jnp.float32)
    sums_buf = jnp.zeros((c * t_win * b_cap,), jnp.float32)
    for t in range(t_win):
        for ci in range(c):
            sl_n = slice(ci * b_cap, (ci + 1) * b_cap)
            sl_b = slice(cb + ci * n_nbr, cb + (ci + 1) * n_nbr)
            sl_s = slice(ci * t_win * b_cap, (ci + 1) * t_win * b_cap)
            g_c = jnp.concatenate([g[t, sl_n], g[t, sl_b]], axis=0)
            if mcode is None:
                phis = sums[t, sl_n, 0]
            else:
                mc_c = jnp.concatenate([mcode[t, sl_n],
                                        mcode[t, sl_b]], axis=0)
                m_v = (mc_c == lin[None, :] + 1).astype(jnp.float32)
                rs = (mc_c > 0).astype(jnp.float32)
                g_c = (jnp.dot(m_v, rows_buf[sl_s],
                               preferred_element_type=jnp.float32)
                       + (1.0 - rs) * g_c)
                phis = (jnp.dot(m_v[:b_cap], sums_buf[sl_s],
                                preferred_element_type=jnp.float32)
                        + (1.0 - rs[:b_cap, 0]) * sums[t, sl_n, 0])
            # compact yf/mf: chain ci's rows hold its [B, n] block
            yf_c = yf[t, sl_n]
            mf_c = mf[t, sl_n]
            rows, sums_new = phi_ops.phi_update_core(
                cfg, g_c[:b_cap], phis, g_c[b_cap:][None],
                yf_c > 0.5, betas[ci], st.step_count + t, noise[t, sl_n],
                mf_c > 0.5)
            rows_buf = jax.lax.dynamic_update_slice(
                rows_buf, rows, (ci * t_win * b_cap + t * b_cap, 0))
            sums_buf = jax.lax.dynamic_update_slice(
                sums_buf, sums_new, (ci * t_win * b_cap + t * b_cap,))
            rows_safe = jnp.where(nmask[t, sl_n] > 0.5, rows, 1.0 / k)
            sl_e = slice(ci * e_cap, (ci + 1) * e_cap)
            lane_eye = jnp.arange(b_cap, dtype=jnp.int32)
            oh_u = ((lanes_u[t, sl_e] - ci * b_cap) == lane_eye
                    ).astype(jnp.float32)                  # [E, B]
            oh_v = ((lanes_v[t, sl_e] - ci * b_cap) == lane_eye
                    ).astype(jnp.float32)
            pi_u = jnp.dot(oh_u, rows_safe,
                           preferred_element_type=jnp.float32)
            pi_v = jnp.dot(oh_v, rows_safe,
                           preferred_element_type=jnp.float32)
            grads = beta_ops.beta_gradients_core(
                cfg, thetas[ci], betas[ci], pi_u, pi_v,
                yef[t, sl_e, 0] > 0.5, emf[t, sl_e, 0] > 0.5)
            thetas[ci], betas[ci] = beta_ops.theta_step(
                cfg, thetas[ci], grads, wts[t, ci, 0],
                st.beta_count + 1 + t,
                jnp.stack([bnoise[t, ci], bnoise[t, c + ci]], axis=1))
    theta_cb2 = jnp.concatenate(
        [jnp.stack([th[:, 0] for th in thetas], axis=0),
         jnp.stack([th[:, 1] for th in thetas], axis=0)], axis=0)
    beta_cb2 = jnp.stack(betas, axis=0)
    return rows_buf, sums_buf[:, None], theta_cb2, beta_cb2


def _chunk_ppx(cfg: Config, num_chains: int, edge_set: EdgeSet,
               heldout_set: EdgeSet, adjacency,
               eu: jnp.ndarray, ev: jnp.ndarray, state: ChainState,
               num_evals: int, interval: int):
    """num_evals x (interval fused chain steps + one per-chain eval) in
    ONE dispatch — the chain-engine analog of
    learner.train_steps_fused_ppx. Returns (state, neg_avg_log
    [num_evals, C])."""
    def outer(st: ChainState, _):
        st = _chunk(cfg, num_chains, edge_set, heldout_set, adjacency,
                    st, interval)
        return _ppx(cfg, num_chains, heldout_set, eu, ev, st)

    return jax.lax.scan(outer, state, None, length=num_evals)


def _ppx(cfg: Config, num_chains: int, heldout_set: EdgeSet,
         eu: jnp.ndarray, ev: jnp.ndarray, state: ChainState):
    """Per-chain perplexity over the shared heldout population."""
    c = num_chains
    h = eu.shape[0]
    k = cfg.K
    count = state.ppx_count + 1
    y = heldout_set.has_edges(eu, ev)                        # [H]
    offsets = (jnp.arange(c, dtype=jnp.int32) * cfg.N)[:, None]
    pi_u = state.pi[(eu[None, :] + offsets).reshape(-1)].astype(
        jnp.float32).reshape(c, h, k)
    pi_v = state.pi[(ev[None, :] + offsets).reshape(-1)].astype(
        jnp.float32).reshape(c, h, k)
    eps = cfg.epsilon
    pp = pi_u * pi_v
    pi_sum = jnp.sum(pp, axis=-1)
    s_link = jnp.sum(pp * state.beta[:, None, :], axis=-1)
    s_non = (jnp.sum(pp * (1.0 - state.beta[:, None, :]), axis=-1)
             + (1.0 - pi_sum) * (1.0 - eps))
    lik = jnp.maximum(jnp.where(y[None, :], s_link, s_non), 1e-30)
    cnt = count.astype(pp.dtype)
    ppx_new = (state.ppx_per_edge * (cnt - 1.0) + lik) / cnt   # [C,H]
    neg_avg = -jnp.mean(jnp.log(ppx_new), axis=-1)             # [C]
    state = state._replace(ppx_per_edge=ppx_new, ppx_count=count)
    return state, neg_avg


class FlatChainLearner:
    """C chains, one flat row space, one fused program per chunk."""

    def __init__(self, cfg: Config, graph: Graph, split: DataSplit,
                 num_chains: int):
        from mcmc_ammsb_tpu.config import PhiImpl, RngBackend
        assert num_chains >= 1
        if cfg.rng_backend != RngBackend.NATIVE:
            raise ValueError("FlatChainLearner supports the native RNG "
                             "backend only (per-thread reference streams "
                             "are single-chain semantics)")
        if cfg.phi_impl != PhiImpl.JNP:
            raise ValueError("FlatChainLearner supports phi_impl=jnp only")
        if cfg.pi_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown pi_dtype {cfg.pi_dtype!r}")
        if cfg.window > 1 and not cfg.shared_neighbors:
            raise ValueError("window > 1 on the chain engine requires "
                             "shared_neighbors (the mega-kernel "
                             "operates on the shared-draw layout)")
        if len(split.heldout_edges_u) == 0:
            raise ValueError("no held-out edges: heldout_ratio too small "
                             "for this graph")
        cfg = cfg.replace(device_sampling=True)
        self.cfg = cfg
        self.num_chains = num_chains
        self.training_set = build_edge_set(
            cfg.edgeset_backend, cfg.N, graph.edges_u, graph.edges_v)
        self.heldout_set = build_edge_set(
            cfg.edgeset_backend, cfg.N, split.heldout_u, split.heldout_v)
        self.heldout_u = jnp.asarray(split.heldout_edges_u)
        self.heldout_v = jnp.asarray(split.heldout_edges_v)
        self.adjacency = (jnp.asarray(graph.offsets, jnp.int32),
                          jnp.asarray(graph.cols, jnp.int32))
        self.timers = StageTimers()

        h = len(split.heldout_edges_u)
        pis, phis, thetas, betas = [], [], [], []
        base = None
        for ci in range(num_chains):
            st = init_state(cfg.replace(init_seed=cfg.init_seed + ci), h)
            base = st
            pis.append(st.pi); phis.append(st.phi_sum)
            thetas.append(st.theta); betas.append(st.beta)
        self.state = ChainState(
            pi=jnp.concatenate(pis, axis=0),
            phi_sum=jnp.concatenate(phis, axis=0),
            theta=jnp.stack(thetas),
            beta=jnp.stack(betas),
            step_count=base.step_count,
            beta_count=base.beta_count,
            ppx_per_edge=jnp.zeros((num_chains, h), jnp.float32),
            ppx_count=jnp.asarray(0, jnp.int32),
            phi_key=base.phi_key,
            beta_key=base.beta_key,
            neighbor_key=base.neighbor_key,
            sample_key=base.sample_key,
        )
        self._chunk = jax.jit(
            partial(_chunk, cfg, num_chains),
            static_argnames="num_steps", donate_argnums=(3,))
        self._ppx = jax.jit(partial(_ppx, cfg, num_chains),
                            donate_argnums=(3,))
        self._chunk_ppx = jax.jit(
            partial(_chunk_ppx, cfg, num_chains),
            static_argnames=("num_evals", "interval"),
            donate_argnums=(5,))

    def run(self, max_iters: int) -> None:
        spc = max(1, self.cfg.steps_per_call)
        with self.timers.stage("total"):
            done = 0
            while done < max_iters:
                take = min(spc, max_iters - done)
                with self.timers.stage("device_step"):
                    self.state = self._chunk(
                        self.training_set, self.heldout_set,
                        self.adjacency, self.state, num_steps=take)
                done += take
            int(self.state.step_count)  # fence inside the timer

    def run_with_ppx(self, max_iters: int, interval: int):
        """Train max_iters steps with a per-chain held-out eval every
        ``interval`` steps fused into single dispatches (_chunk_ppx) —
        the chain-engine analog of Learner.run_with_ppx. Returns a list
        of {step, ppx: [C] array} dicts; bit-exact with the chunked
        host loop (tested)."""
        from mcmc_ammsb_tpu.learner import run_fused_eval_series

        spc = max(1, self.cfg.steps_per_call)

        def dispatch(take):
            self.state, neg = self._chunk_ppx(
                self.training_set, self.heldout_set, self.adjacency,
                self.heldout_u, self.heldout_v, self.state,
                num_evals=take, interval=interval)
            return neg               # [take, C] device; driver blocks

        def tail(t):
            with self.timers.stage("device_step"):
                self.state = self._chunk(
                    self.training_set, self.heldout_set,
                    self.adjacency, self.state, num_steps=t)
            int(self.state.step_count)  # fence

        # np.exp in record (not jnp in dispatch): heldout_perplexity
        # exps with numpy, and the series contract is bit-exact
        # equality with it
        return run_fused_eval_series(
            self.timers, spc, max_iters, interval, dispatch,
            lambda: int(self.state.step_count),
            lambda neg_np, i, step: {"step": step,
                                     "ppx": np.exp(neg_np[i])},
            tail)

    def heldout_perplexity(self) -> np.ndarray:
        with self.timers.stage("ppx"):
            self.state, neg = self._ppx(
                self.heldout_set, self.heldout_u, self.heldout_v,
                self.state)
            return np.exp(np.asarray(neg))

    def beta_rhat(self, draws: int = 10) -> np.ndarray:
        """Gelman-Rubin PSRF [K] over beta across the chains (the
        population-level convergence diagnostic a single chain cannot
        provide — chains.rhat)."""
        from mcmc_ammsb_tpu.chains import beta_rhat_series

        return beta_rhat_series(self, draws)

    def fused_stage_profile(self, iters=None) -> dict:
        """TRUE per-stage attribution of the fused multi-chain program
        (Learner.fused_stage_profile contract): a traced production
        chunk aggregated by the named_scope stages in _chunk."""
        from mcmc_ammsb_tpu.utils import profiling

        spc = max(1, self.cfg.steps_per_call)
        iters = iters or max(spc, 200)
        iters = max(spc, (iters // spc) * spc)
        self.run(spc)  # compile outside the trace
        hlo_text = None
        if jax.default_backend() == "cpu":
            hlo_text = self._chunk.lower(
                self.training_set, self.heldout_set, self.adjacency,
                self.state, num_steps=spc,
            ).compile().as_text()
        prof = profiling.profile_trace(lambda: self.run(iters),
                                       hlo_text=hlo_text)
        prof["steps"] = iters
        return prof

    def print_stage_profile(self, log=print, iters=None) -> None:
        from mcmc_ammsb_tpu.utils import profiling

        prof = self.fused_stage_profile(iters)
        if prof["source"] == "none" or prof["total_op_seconds"] <= 0:
            log("trace captured no attributable device ops")
            return
        profiling.format_stage_table(prof, prof["steps"], log)
