"""T-step windowed fused training loop — the Pallas mega-kernel path.

Motivation (docs/design.md "the scatter wall holds"): at reference
shapes the fused scan body is bound by ~13 XLA per-op dispatch
overheads of ~1-3 us each plus the scatter lowering — NOT by FLOPs or
bytes. Structural wins must REMOVE ops from the loop body. This module
advances the scan T steps per iteration:

  1. ONE bulk gather of all T steps' pi rows ([T*(B+n)] indices);
  2. ONE Pallas kernel executing the T sequential phi/beta updates
     entirely in VMEM (python-unrolled, zero DMA — XLA's gather/
     scatter stay outside: the recorded 709 ns/row per-row-DMA
     negative says Pallas cannot beat them);
  3. ONE scatter of the T*B staged rows (last-write-wins masked).

Exactness: step t+1 may read a row an earlier step wrote. Windows
containing such intra-window collisions (~2% at T=4, ~11% at T=8 on
the bench graph) run a kernel variant that redirects each colliding
read to the staged row via an exact one-hot select (coefficients are
exactly 0/1, so the select introduces no float error); clean windows
skip the correction under lax.cond. CRITICALLY, pi itself is only
READ inside the cond — the scatter runs unconditionally outside it.
(The first formulation scattered inside the cond branches; XLA cannot
alias a donated buffer through a two-branch conditional, so every
dirty window paid a full [N, K] pi copy ≈ 500 us — the measured
round-3 regression.) Trajectories are exactly the sequential scan's
modulo float-op scheduling (golden-tested against the sequential scan
on collision-heavy graphs; ``window_impl='jnp'`` runs the same
windowed structure with the stock jnp cores as the cross-check
schedule — the reference's multi-mode validation pattern,
wg-phi-test.cc:116-158).

Reference behavior reproduced: the same per-step numerics as
/root/reference/mcmc/phi.cc:84-173 and beta.cc:30-137 (via the same
formulas as ops/phi.py / ops/beta.py); the fusion itself is the
reference's own winning move (phi.cc:305-412 fuses its pipeline
stages into one kernel) taken to the TPU limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.ops import beta as beta_ops
from mcmc_ammsb_tpu.ops import phi as phi_ops

_PHI_FLOOR = 1e-24
_THETA_FLOOR = 1e-24

#: Measured-safe bound on the kernel's K-major VMEM working set.
#: Every known-good shape sits at ~26 MiB by this estimate (single
#: K=4096/T=12, chains C=16/T=12 and C=32/T=6 at K=256, K=8192/T=6
#: bf16); K=8192/T=12 (~52 MiB) FAULTED the TPU worker (crash, not a
#: compile error) even under the 100 MiB scoped-vmem grant — the
#: grant covers the declared operands, not the correction
#: intermediates. Stay under the measured line.
VMEM_ENVELOPE_BYTES = 32 * 1024 * 1024


def window_working_set_bytes(k: int, t_win: int, n_chains: int,
                             b_cap: int, n_smpl: int) -> int:
    """Estimate of the blocked window kernel's K-major VMEM bytes:
    the gathered rows g [T, C*(B+n), K], the phi noise [T, C*B, K]
    and the staged output rows [C*T*B, K] (fp32 in-kernel compute
    regardless of pi storage dtype). The K-independent pair/one-hot
    tensors are small at reference shapes and excluded."""
    return 4 * k * t_win * n_chains * (b_cap + n_smpl + 2 * b_cap)


def max_safe_window(cfg: Config, n_chains: int = 1,
                    candidates=(12, 8, 6, 4, 3, 2)) -> int:
    """Largest candidate window size whose working set fits
    VMEM_ENVELOPE_BYTES (0 if none does)."""
    for t in candidates:
        if window_working_set_bytes(
                cfg.K, t, n_chains, cfg.max_batch_nodes,
                cfg.num_node_sample) <= VMEM_ENVELOPE_BYTES:
            return t
    return 0


# ---------------------------------------------------------------------------
# Window orchestration
# ---------------------------------------------------------------------------

def windowed_scan(cfg: Config, state, xs, body,
                  gather_fn=None, scatter_fn=None):
    """Scan T-step windows over the hoisted per-step operands; any
    non-multiple tail runs through the sequential ``body``.

    ``xs`` is train_steps_scan's operand tuple:
    (batches, neighbors [S,1,n], y_phi, phi_noise, beta_noise,
     y_edges, lanes_u, lanes_v).

    ``gather_fn(cfg, s, batch, nbrs) -> (g [T,B+n,K], sums [T,B])`` and
    ``scatter_fn(cfg, s, batch, keep, rows_flat, sums_flat) ->
    (pi, phi_sum)`` override the window's bulk pi read/write — the
    single-device defaults index ``s.pi`` directly; the row-sharded
    multi-chip engine (parallel/sharded.py) substitutes its psum row
    fetch and the per-shard local write application, turning its
    per-step collectives into one collective per T-step window."""
    t_win = cfg.window
    s_len = xs[1].shape[0]
    n_win = s_len // t_win
    tail = s_len - n_win * t_win
    if n_win == 0:
        state, _ = jax.lax.scan(body, state, xs, unroll=cfg.scan_unroll)
        return state

    xs_w = jax.tree.map(
        lambda a: a[: n_win * t_win].reshape(n_win, t_win, *a.shape[1:]),
        xs)
    batches_w = xs_w[0]
    b_cap = cfg.max_batch_nodes

    if cfg.window_correction == "always":
        dirty = jnp.zeros((n_win,), bool)     # every window corrects
    else:
        with jax.named_scope("window_dirty"):
            dirty = _dirty_windows(batches_w.nodes,
                                   batches_w.node_mask,
                                   xs_w[1][:, :, 0, :], t_win)

    core = (_window_core_jnp if cfg.window_impl == "jnp"
            else _window_core_pallas)
    if gather_fn is None:
        gather_fn = _window_gather
    if scatter_fn is None:
        scatter_fn = _window_scatter

    def wbody(s, xw):
        xs_t, dirty_w = xw
        batch = xs_t[0]
        nbrs = xs_t[1][:, 0, :]                             # [T, n]
        with jax.named_scope("window_gather"):
            g, sums_g = gather_fn(cfg, s, batch, nbrs)

        def corrected(op):
            gg, ss = op
            with jax.named_scope("window_correct"):
                mcode = _correction_codes(cfg, batch.nodes,
                                          batch.node_mask, nbrs)
            return core(cfg, s, xs_t, gg, ss, mcode)

        def plain(op):
            gg, ss = op
            return core(cfg, s, xs_t, gg, ss, None)

        if cfg.window_correction == "always":
            # single branch: every window pays the (exact, cheap)
            # one-hot correction; no cond in the program at all
            rows_flat, sums_flat, theta, beta = corrected((g, sums_g))
        else:
            # pi is only READ inside the cond; the scatter runs
            # OUTSIDE it so the donated [N, K] buffer keeps its
            # in-place update (a scatter under a two-branch
            # conditional forces a full copy)
            rows_flat, sums_flat, theta, beta = jax.lax.cond(
                dirty_w, corrected, plain, (g, sums_g))
        with jax.named_scope("window_scatter"):
            keep = _last_write_wins(batch.nodes, batch.node_mask, t_win)
            pi, phi_sum = scatter_fn(cfg, s, batch, keep,
                                     rows_flat, sums_flat)
        s = s._replace(pi=pi, phi_sum=phi_sum, theta=theta, beta=beta,
                       step_count=s.step_count + t_win,
                       beta_count=s.beta_count + t_win)
        return s, None

    state, _ = jax.lax.scan(wbody, state, (xs_w, dirty))
    if tail:
        xs_tail = jax.tree.map(lambda a: a[n_win * t_win:], xs)
        state, _ = jax.lax.scan(body, state, xs_tail,
                                unroll=cfg.scan_unroll)
    return state


def _dirty_windows(nodes, mask, nbrs, t_win):
    """[W] bool: window has an intra-window read-after-write (a later
    step reads a row an earlier step wrote) or write-after-write.
    Shapes: nodes/mask [W,T,B], nbrs [W,T,n]."""
    writes = jnp.where(mask, nodes, -2)                    # [W,T,B]
    reads = jnp.concatenate(
        [jnp.where(mask, nodes, -1), nbrs], axis=2)        # [W,T,R]
    # masked write lanes are non-writes: they must never match each
    # other (every padded lane carries the same sentinel) nor a read
    wvalid = mask[:, :, :, None, None] & mask[:, None, None, :, :]
    t_r = jnp.arange(t_win)
    later_reads = (t_r[None, :, None, None, None]
                   > t_r[None, None, None, :, None])       # read t > write t'
    rw = (reads[:, :, :, None, None] == writes[:, None, None, :, :]
          ) & later_reads & mask[:, None, None, :, :]
    distinct = (t_r[None, :, None, None, None]
                != t_r[None, None, None, :, None])
    ww = (writes[:, :, :, None, None] == writes[:, None, None, :, :]
          ) & distinct & wvalid
    return rw.any(axis=(1, 2, 3, 4)) | ww.any(axis=(1, 2, 3, 4))


def _last_write_wins(nodes, mask, t_win):
    """[T, B] bool: valid writes NOT superseded by a later step's write
    of the same row — the bulk scatter must apply exactly the last
    write (duplicate scatter indices apply in unspecified order)."""
    wf = jnp.where(mask, nodes, -2)                        # [T, B]
    eqw = wf[:, :, None, None] == wf[None, None, :, :]     # [T,B,T,B]
    t_r = jnp.arange(t_win)
    later = (t_r[None, None, :, None] > t_r[:, None, None, None])
    superseded = (eqw & later & mask[None, None, :, :]).any(axis=(2, 3))
    return mask & ~superseded


def _correction_codes(cfg: Config, nodes, mask, nbrs):
    """[T, B+n, 1] int32: 1 + the staged-buffer slot of the LATEST
    earlier write of the row read lane (t, i) references, 0 when the
    pre-window gather is already current. The kernel expands each
    step's codes into an exact one-hot ([B+n, T*B], coefficients
    exactly 0/1) on the fly — streaming codes instead of the expanded
    matrix keeps the correction's VMEM footprint O(T*(B+n)) instead of
    O(T^2 * B * (B+n)), which is what bounds the usable window size."""
    t_win, b_cap = nodes.shape
    lin = jnp.arange(t_win * b_cap, dtype=jnp.int32)
    writes_flat = jnp.where(mask, nodes, -2).reshape(-1)   # [T*B]
    reads = jnp.concatenate([nodes, nbrs], axis=1)         # [T, B+n]
    eq = reads[:, :, None] == writes_flat[None, None, :]   # [T,B+n,T*B]
    earlier = ((lin[None, None, :] // b_cap)
               < jnp.arange(t_win)[:, None, None])
    sel = eq & earlier
    mcode = jnp.max(jnp.where(sel, lin[None, None, :] + 1, 0), axis=-1)
    return mcode[:, :, None]


def _window_gather(cfg, s, batch, nbrs):
    b_cap, k = cfg.max_batch_nodes, cfg.K
    t_win = batch.nodes.shape[0]
    read_idx = jnp.concatenate([batch.nodes, nbrs], axis=1)  # [T, B+n]
    g = s.pi[read_idx.reshape(-1)].astype(jnp.float32).reshape(
        t_win, read_idx.shape[1], k)
    sums_g = s.phi_sum[batch.nodes.reshape(-1)].reshape(t_win, b_cap)
    return g, sums_g


def _window_scatter(cfg, s, batch, keep, rows_flat, sums_flat):
    """Single-device bulk write-back of the window's staged rows (the
    last-write-wins mask ``keep`` already excludes superseded writes)."""
    flat_nodes = batch.nodes.reshape(-1)
    safe = jnp.where(keep.reshape(-1), flat_nodes, cfg.N)
    pi = s.pi.at[safe].set(rows_flat.astype(s.pi.dtype), mode="drop")
    phi_sum = s.phi_sum.at[safe].set(sums_flat, mode="drop")
    return pi, phi_sum


# ---------------------------------------------------------------------------
# Window core, jnp schedule (golden twin of the kernel)
# ---------------------------------------------------------------------------

def _window_core_jnp(cfg: Config, s, xs_t, g, sums_g, mcode):
    """T sequential steps on the bulk-gathered rows with the stock jnp
    cores; ``mcode`` (when not None, [T, B+n, 1]) redirects
    intra-window stale reads to the staged rows via an exact one-hot
    select. Returns (rows_flat, sums_flat, theta, beta)."""
    batch, nbrs_s, y_w, nphi_w, nbeta_w, ye_w, lu, lv = xs_t
    t_win = cfg.window
    b_cap, k = cfg.max_batch_nodes, cfg.K
    lane_eye = jnp.arange(b_cap, dtype=jnp.int32)
    oh_u = (lu[..., None] == lane_eye).astype(jnp.float32)  # [T, E, B]
    oh_v = (lv[..., None] == lane_eye).astype(jnp.float32)
    nbrs = nbrs_s[:, 0, :]
    lin = jnp.arange(t_win * b_cap, dtype=jnp.int32)
    theta, beta = s.theta, s.beta
    rows_buf = jnp.zeros((t_win * b_cap, k), jnp.float32)
    sums_buf = jnp.zeros((t_win * b_cap,), jnp.float32)
    with jax.named_scope("window_body"):
        for t in range(t_win):
            if mcode is None:
                pi_n = g[t, :b_cap]
                pi_nb = g[t, b_cap:][None]
                phis = sums_g[t]
            else:
                m_t = (mcode[t] == lin[None, :] + 1).astype(jnp.float32)
                rs = (mcode[t] > 0).astype(jnp.float32)     # [B+n, 1]
                g_corr = (jnp.dot(m_t, rows_buf,
                                  preferred_element_type=jnp.float32)
                          + (1.0 - rs) * g[t])
                pi_n = g_corr[:b_cap]
                pi_nb = g_corr[b_cap:][None]
                phis = (jnp.dot(m_t[:b_cap], sums_buf,
                                preferred_element_type=jnp.float32)
                        + (1.0 - rs[:b_cap, 0]) * sums_g[t])
            nbr_mask = nbrs[t][None, :] != batch.nodes[t][:, None]
            rows, sums = phi_ops.phi_update_core(
                cfg, pi_n, phis, pi_nb, y_w[t], beta,
                s.step_count + t, nphi_w[t], nbr_mask)
            rows_buf = jax.lax.dynamic_update_slice(
                rows_buf, rows, (t * b_cap, 0))
            sums_buf = jax.lax.dynamic_update_slice(
                sums_buf, sums, (t * b_cap,))
            rows_safe = jnp.where(batch.node_mask[t][:, None], rows,
                                  1.0 / k)
            pi_u = jnp.dot(oh_u[t], rows_safe,
                           preferred_element_type=jnp.float32)
            pi_v = jnp.dot(oh_v[t], rows_safe,
                           preferred_element_type=jnp.float32)
            grads = beta_ops.beta_gradients_core(
                cfg, theta, beta, pi_u, pi_v, ye_w[t],
                batch.edge_mask[t])
            theta, beta = beta_ops.theta_step(
                cfg, theta, grads, batch.weight[t],
                s.beta_count + 1 + t, nbeta_w[t])
    return rows_buf, sums_buf, theta, beta


# ---------------------------------------------------------------------------
# Window core, Pallas mega-kernel
# ---------------------------------------------------------------------------

def _window_kernel(cfg: Config, t_win: int, n_chains: int,
                   b_cap: int, e_cap: int, k: int, corrected: bool,
                   refs):
    """``t_win`` sequential SGRLD steps in VMEM (one pallas_call): the
    phi factorized contraction (ops/phi.py:89-149), the staged-row
    beta gradient fan-in (ops/beta.py:56-84 with one-hot lane selects)
    and the theta SGRLD step (beta.cc:51-82), python-unrolled over t.

    Multi-chain (BLOCKED, not serialized): every step processes ALL
    ``n_chains`` chains at once as stacked row blocks — pi rows
    [C*B, K], neighbor rows [C*n, K], pair tensors [C*B, C*n]
    (block-diagonal: the mask is zero off-block), edge one-hots
    [C*E, C*B] (block-diagonal by construction: lane ids carry chain
    offsets). Chains are independent, so batching them inside a step
    turns C small latency-bound matmuls into one MXU-sized matmul —
    the serialized T*C-virtual-step variant measured 0.7x the
    UNwindowed chain engine (docs/design.md round 3).

    The block-diagonal pair tensors and the edge one-hots are BUILT
    IN-KERNEL (VMEM iota compares) from compact operands — yf/mf ride
    in as per-chain [C*B, n] and the edge endpoints as int32 lane ids
    [C*E, 1] — so the kernel's HBM operand traffic stays linear in C
    while only the in-VMEM working set is quadratic (the round-3
    window_prep stage that materialized them in HBM was ~7% of the
    C=16 step and scaled C^2).

    theta rides component-major as [2C, K] (rows [:C] = theta_0 of
    every chain, rows [C:] = theta_1) so the per-chain theta SGRLD
    step is one [2C, K] vector op; beta is [C, K]. ``b_cap``/``e_cap``
    are PER-CHAIN capacities.

    The staged-row buffer is CHAIN-major ([C, T, B] flattened) so that
    each chain's intra-window read-after-write corrections — chains
    can never collide with each other — contract a [B+n, T*B] one-hot
    against that chain's contiguous [T*B, K] block: correction cost is
    C x the single-chain cost, not (T*C)^2. With n_chains=1 this is
    exactly the single-chain kernel."""
    if corrected:
        (g_ref, sums_ref, yf_ref, mf_ref, nmask_ref, noise_ref,
         bnoise_ref, yef_ref, emask_ref, lu_ref, lv_ref, m_ref,
         wts_ref, epsphi_ref, epstheta_ref, theta_ref, beta_ref,
         rows_out_ref, sums_out_ref, theta_out_ref, beta_out_ref) = refs
    else:
        (g_ref, sums_ref, yf_ref, mf_ref, nmask_ref, noise_ref,
         bnoise_ref, yef_ref, emask_ref, lu_ref, lv_ref,
         wts_ref, epsphi_ref, epstheta_ref, theta_ref, beta_ref,
         rows_out_ref, sums_out_ref, theta_out_ref, beta_out_ref) = refs
        m_ref = None
    eps = cfg.epsilon
    alpha = cfg.alpha_value
    f32 = jnp.float32
    nc = n_chains
    cb = nc * b_cap                                        # C*B rows
    n_cap = yf_ref.shape[2]                                # n per chain
    theta_full = theta_ref[:]                              # [2C, K]
    beta_full = beta_ref[:]                                # [C, K]
    eta = jnp.concatenate([jnp.full((nc, k), cfg.eta0, f32),
                           jnp.full((nc, k), cfg.eta1, f32)], axis=0)

    def per_row(x, rows):
        # [C, K] -> [C*rows, K] chain-block broadcast
        return jnp.broadcast_to(x[:, None, :],
                                (nc, rows, k)).reshape(nc * rows, k)

    def block_expand(compact):
        # [C*B, n] per-chain pairs -> [C*B, C*n] with chain blocks on
        # the diagonal; off-block entries are tile garbage — callers
        # must gate them through ``same_chain`` / the mf mask
        return jnp.concatenate([compact] * nc, axis=1)

    if nc > 1:
        # [C*B, C*n] bool: row's chain == column's chain block
        same_chain = (
            jax.lax.broadcasted_iota(jnp.int32, (cb, nc * n_cap), 0)
            // b_cap
            == jax.lax.broadcasted_iota(jnp.int32, (cb, nc * n_cap), 1)
            // n_cap)
    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (nc * e_cap, cb), 1)

    if corrected:
        # staged buffers are read back through 0/1 coefficients;
        # not-yet-written rows must be zeros, not NaN garbage
        rows_out_ref[:] = jnp.zeros((nc * t_win * b_cap, k), f32)
        sums_out_ref[:] = jnp.zeros((nc * t_win * b_cap, 1), f32)
    for t in range(t_win):
        gt = g_ref[t]                                      # [C*(B+n), K]
        n_cap = (gt.shape[0] - cb) // nc                   # n per chain
        if corrected:
            mc = m_ref[t]                                  # [C*(B+n), 1]
            pn_parts, pb_parts, ph_parts = [], [], []
            for c in range(nc):
                # chain c's read lanes: its node block + its nbr block
                mc_c = jnp.concatenate(
                    [mc[c * b_cap:(c + 1) * b_cap],
                     mc[cb + c * n_cap:cb + (c + 1) * n_cap]],
                    axis=0)                                # [B+n, 1]
                g_c = jnp.concatenate(
                    [gt[c * b_cap:(c + 1) * b_cap],
                     gt[cb + c * n_cap:cb + (c + 1) * n_cap]],
                    axis=0)                                # [B+n, K]
                lin = jax.lax.broadcasted_iota(
                    jnp.int32, (g_c.shape[0], t_win * b_cap), 1)
                m_t = (mc_c == lin + 1).astype(f32)        # [B+n, T*B]
                rs = (mc_c > 0).astype(f32)                # [B+n, 1]
                staged = rows_out_ref[c * t_win * b_cap:
                                      (c + 1) * t_win * b_cap, :]
                g_c = (jnp.dot(m_t, staged,
                               preferred_element_type=f32)
                       + (1.0 - rs) * g_c)
                ssums = sums_out_ref[c * t_win * b_cap:
                                     (c + 1) * t_win * b_cap, :]
                ph_c = (jnp.dot(m_t[:b_cap], ssums,
                                preferred_element_type=f32)
                        + (1.0 - rs[:b_cap])
                        * sums_ref[t, c * b_cap:(c + 1) * b_cap])
                pn_parts.append(g_c[:b_cap])
                pb_parts.append(g_c[b_cap:])
                ph_parts.append(ph_c)
            pi_n = jnp.concatenate(pn_parts, axis=0)       # [C*B, K]
            pi_nb = jnp.concatenate(pb_parts, axis=0)      # [C*n, K]
            phis = jnp.concatenate(ph_parts, axis=0)       # [C*B, 1]
        else:
            pi_n = gt[:cb]                                 # [C*B, K]
            pi_nb = gt[cb:]                                # [C*n, K]
            phis = sums_ref[t]                             # [C*B, 1]
        if nc > 1:
            yf = block_expand(yf_ref[t])                   # [C*B, C*n]
            mf = jnp.where(same_chain, block_expand(mf_ref[t]), 0.0)
        else:
            yf = yf_ref[t]                                 # [B, n]
            mf = mf_ref[t]
        beta_rows = per_row(beta_full, b_cap)              # [C*B, K]
        # --- phi stage (factorized shared contraction, blocked) ------
        sgn = 2.0 * yf - 1.0
        e = jnp.where(yf > 0.5, eps, 1.0 - eps)
        w = pi_n * (beta_rows - eps)
        q = jnp.dot(w, pi_nb.T, preferred_element_type=f32)  # [CB, Cn]
        p = sgn * q + e
        # off-block lanes (mf==0) hold cross-chain products; clamp so
        # a pathological p<=0 can't turn 0-masked lanes into NaN
        p = jnp.where(mf > 0.5, p, 1.0)
        inv_p = 1.0 / p
        a = sgn * inv_p * mf
        ce = jnp.sum(e * inv_p * mf, axis=1, keepdims=True)  # [CB, 1]
        n_valid = jnp.sum(mf, axis=1, keepdims=True)
        contrib = jnp.dot(a, pi_nb, preferred_element_type=f32)
        s_contrib = (beta_rows - eps) * contrib + ce         # [CB, K]
        inv_phi = 1.0 / phis
        grads = (s_contrib - n_valid) * inv_phi
        eps_t = epsphi_ref[t, 0]
        phi_k = pi_n * phis
        phi_new = jnp.abs(
            phi_k
            + eps_t / 2.0 * (alpha - phi_k + (cfg.N / n_valid) * grads)
            + jnp.sqrt(eps_t * phi_k) * noise_ref[t])
        phi_new = jnp.maximum(phi_new, _PHI_FLOOR)
        sums_new = jnp.sum(phi_new, axis=-1, keepdims=True)  # [CB, 1]
        rows_new = phi_new / sums_new
        for c in range(nc):
            dst = c * t_win * b_cap + t * b_cap
            rows_out_ref[dst:dst + b_cap, :] = (
                rows_new[c * b_cap:(c + 1) * b_cap])
            sums_out_ref[dst:dst + b_cap, :] = (
                sums_new[c * b_cap:(c + 1) * b_cap])
        # --- beta stage on the staged rows ----------------------------
        nmask = nmask_ref[t]                                # [C*B, 1]
        rows_safe = jnp.where(nmask > 0.5, rows_new, 1.0 / k)
        # exact one-hots built in-VMEM from the chain-offset lane ids
        oh_u = (lu_ref[t] == lane_iota).astype(f32)         # [C*E, C*B]
        oh_v = (lv_ref[t] == lane_iota).astype(f32)
        pi_u = jnp.dot(oh_u, rows_safe,
                       preferred_element_type=f32)          # [C*E, K]
        pi_v = jnp.dot(oh_v, rows_safe,
                       preferred_element_type=f32)
        yef = yef_ref[t]                                    # [C*E, 1]
        emf = emask_ref[t]                                  # [C*E, 1]
        theta0 = per_row(theta_full[:nc], e_cap)            # [C*E, K]
        theta1 = per_row(theta_full[nc:], e_cap)
        beta_e = per_row(beta_full, e_cap)
        pp = pi_u * pi_v
        pi_sum = jnp.sum(pp, axis=-1, keepdims=True)        # [C*E, 1]
        probs = jnp.where(yef > 0.5, beta_e, 1.0 - beta_e) * pp
        prob_0 = jnp.where(yef > 0.5, eps, 1.0 - eps) * (1.0 - pi_sum)
        probs_sum = jnp.sum(probs, axis=-1, keepdims=True) + prob_0
        f = probs / probs_sum                               # [C*E, K]
        inv_ts = 1.0 / (theta0 + theta1)
        g0 = (f * ((1.0 - yef) / theta0 - inv_ts)) * emf
        g1 = (f * (yef / theta1 - inv_ts)) * emf
        grad0 = jnp.sum(g0.reshape(nc, e_cap, k), axis=1)   # [C, K]
        grad1 = jnp.sum(g1.reshape(nc, e_cap, k), axis=1)
        grads_t = jnp.concatenate([grad0, grad1], axis=0)   # [2C, K]
        eps_b = epstheta_ref[t, 0]
        wt = wts_ref[t]                                     # [C, 1]
        wt2 = jnp.concatenate([wt, wt], axis=0)             # [2C, 1]
        theta_full = jnp.abs(
            theta_full
            + eps_b / 2.0 * (eta - theta_full + wt2 * grads_t)
            + jnp.sqrt(eps_b * theta_full) * bnoise_ref[t])
        theta_full = jnp.maximum(theta_full, _THETA_FLOOR)
        beta_full = (theta_full[nc:]
                     / (theta_full[:nc] + theta_full[nc:]))
    theta_out_ref[:] = theta_full
    beta_out_ref[:] = beta_full


def window_kernel_call(cfg: Config, n_chains: int, g, sums, yf, mf,
                       nmask, noise, bnoise, yef, emf, lanes_u,
                       lanes_v, mcode, wts, eps_phi, eps_theta,
                       theta_cb, beta_cb):
    """Invoke the mega-kernel on prepared blocked-step operands.

    Leading axis T = windowed steps; chains are stacked as row blocks
    inside each step. Shapes (B/n/E per chain, C = n_chains):
    g [T,C*(B+n),K] (all node blocks then all nbr blocks),
    sums [T,C*B,1], yf/mf [T,C*B,n] COMPACT per-chain pair tensors
    (the kernel expands them block-diagonally in VMEM), nmask
    [T,C*B,1], noise [T,C*B,K], bnoise [T,2C,K] component-major,
    yef/emf [T,C*E,1], lanes_u/lanes_v [T,C*E,1] int32 node-lane ids
    WITH chain offsets (the kernel expands them to exact one-hots in
    VMEM), mcode [T,C*(B+n),1] i32 PER-CHAIN-local staged slot codes
    or None, wts [T,C,1], eps_* [T,1] (SMEM), theta_cb [2C,K]
    component-major, beta_cb [C,K].
    Returns (rows [C*T*B,K] CHAIN-major, sums [C*T*B,1],
    theta_cb', beta_cb')."""
    t_win, _, k = g.shape
    b_cap = sums.shape[1] // n_chains
    e_cap = yef.shape[1] // n_chains
    n_smpl = yf.shape[2]
    ws = window_working_set_bytes(k, t_win, n_chains, b_cap, n_smpl)
    if ws > VMEM_ENVELOPE_BYTES:
        raise ValueError(
            f"window kernel working set ~{ws / 2**20:.0f} MiB "
            f"(K={k}, T={t_win}, C={n_chains}, B={b_cap}, n={n_smpl}) "
            f"exceeds the measured-safe VMEM envelope "
            f"({VMEM_ENVELOPE_BYTES / 2**20:.0f} MiB) — ~52 MiB "
            "FAULTED the TPU worker at K=8192/T=12. Lower window or "
            "num_chains (ops/window.max_safe_window picks the largest "
            "fitting T), or use window=0.")
    f32 = jnp.float32
    corrected = mcode is not None
    args = [g, sums, yf, mf, nmask, noise, bnoise, yef, emf,
            lanes_u, lanes_v]
    if corrected:
        args.append(mcode)
    args += [wts, eps_phi, eps_theta, theta_cb, beta_cb]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_vmem_in = 13 if corrected else 12                    # incl. wts
    in_specs = [vmem] * n_vmem_in + [smem] * 2 + [vmem] * 2

    def kernel(*refs):
        _window_kernel(cfg, t_win, n_chains, b_cap, e_cap, k,
                       corrected, refs)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_chains * t_win * b_cap, k), f32),
            jax.ShapeDtypeStruct((n_chains * t_win * b_cap, 1), f32),
            jax.ShapeDtypeStruct(theta_cb.shape, f32),
            jax.ShapeDtypeStruct(beta_cb.shape, f32),
        ),
        in_specs=in_specs,
        out_specs=(vmem, vmem, vmem, vmem),
        # the kernel is single-invocation (no grid) so XLA's default
        # 16 MB scoped-vmem budget — sized to leave room for pipeline
        # double-buffering that this kernel doesn't do — is the
        # binding constraint on C*T (the blocked working set: pair
        # tensors [C*B, C*n], edge one-hots [C*E, C*B], staged rows
        # [C*T*B, K]). v5e has 128 MiB VMEM; granting 100 MiB lifts
        # the ceiling from C*T<=96 to C=32/T=6-class shapes
        # (docs/design.md round 3 late).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _window_core_pallas(cfg: Config, s, xs_t, g, sums_g, m_sel):
    """ONE pallas_call for the whole T-step window body."""
    batch, nbrs_s, y_w, nphi_w, nbeta_w, ye_w, lu, lv = xs_t
    t_win = cfg.window
    b_cap, k = cfg.max_batch_nodes, cfg.K
    f32 = jnp.float32
    nbrs = nbrs_s[:, 0, :]
    with jax.named_scope("window_prep"):
        nbr_mask = (nbrs[:, None, :]
                    != batch.nodes[:, :, None])             # [T, B, n]
        steps = s.step_count + jnp.arange(t_win, dtype=jnp.int32)
        counts = s.beta_count + 1 + jnp.arange(t_win, dtype=jnp.int32)
        eps_phi = cfg.eps_t(steps).astype(f32)[:, None]     # [T, 1]
        eps_theta = cfg.eps_t(counts).astype(f32)[:, None]
    with jax.named_scope("window_kernel"):
        rows_flat, sums_col, theta_t, beta_row = window_kernel_call(
            cfg, 1, g,
            sums_g[..., None].astype(f32),
            y_w.astype(f32),
            nbr_mask.astype(f32),
            batch.node_mask[..., None].astype(f32),
            nphi_w.astype(f32),
            jnp.swapaxes(nbeta_w, 1, 2).astype(f32),
            ye_w[..., None].astype(f32),
            batch.edge_mask[..., None].astype(f32),
            lu[..., None], lv[..., None], m_sel,
            batch.weight[:, None, None].astype(f32),
            eps_phi, eps_theta,
            jnp.swapaxes(s.theta, 0, 1).astype(f32),
            s.beta[None, :].astype(f32))
    return (rows_flat, sums_col[:, 0], jnp.swapaxes(theta_t, 0, 1),
            beta_row[0])
