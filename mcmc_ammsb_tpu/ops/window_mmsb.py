"""T-step windowed fused loop for the full (non-assortative) MMSB —
the [K,K]-theta Pallas mega-kernel.

Round-3 measurement (docs/design.md "windowed MMSB"): the jnp window
twin buys ~nothing for MMSB (70.1k vs 71.1k sequential at a-MMSB
shapes) — the window's win is the Pallas kernel replacing T steps'
worth of XLA per-op overheads, so a windowed MMSB engine "would need
its own [K,K]-theta Pallas kernel to pay". This module is that kernel.

Structure mirrors ops/window.py (single chain): ONE bulk gather of all
T steps' pi rows, ONE pallas_call executing the T sequential SGRLD
steps entirely in VMEM, ONE last-write-wins scatter. Intra-window
read-after-write collisions are redirected to the staged rows via the
same exact one-hot codes (ops/window._correction_codes — the helpers
are model-agnostic: they see only node ids and masks).

What is MMSB-specific inside the kernel:

* phi stage — the factorized shared-draw contraction of
  models/mmsb._phi_rows_core_shared: g_link = pi_nb @ B^T (a real
  [n,K]x[K,K] MXU matmul, unlike the a-MMSB's elementwise beta
  probs), g_non = rowsum(pi_nb) - g_link (rows are normalized), then
  three [B,n]-shaped matmuls. No [B,n,K] tensor exists.

* theta stage — the per-edge responsibility tensor r in [E,K,K]
  (models/mmsb._theta_grads_core) FLATTENED to 2D [E*K, K] so every
  op is an MXU matmul or a VPU elementwise: rows are (edge, k) pairs,
  columns are l. The edge->row and k->row expanders R [E*K,E] and
  Kx [E*K,K] are exact one-hots built from in-VMEM iota compares
  (coefficients exactly 0/1), the same trick the a-MMSB kernel uses
  for its edge-lane selects. The undirected-graph symmetrization
  0.5*(g + g^T) is computed as 0.5*(g(u,v) + g(v,u)) — a second pass
  with the endpoint roles swapped instead of an in-kernel transpose;
  the two are identical because theta_b and B are maintained exactly
  symmetric (init + symmetrized noise + symmetrized grads,
  models/mmsb.py:94-104, 259-266).

theta_b rides component-major as [2K, K] (rows [:K] = theta_0, rows
[K:] = theta_1) so the SGRLD step is one [2K, K] vector op.

Reference behavior reproduced: the same per-step numerics as the
sequential MMSB scan (models/mmsb.mmsb_steps_scan) — itself the
SGRLD scheme of /root/reference/mcmc/phi.cc:84-173 and
beta.cc:51-82 generalized to the full blockmodel; the fusion is the
reference's own winning move (phi.cc:305-412) taken to the TPU limit.
Golden-tested against the sequential scan on collision-heavy graphs
(tests/test_window_mmsb.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.ops.window import (VMEM_ENVELOPE_BYTES,
                                       _correction_codes,
                                       _dirty_windows,
                                       _last_write_wins,
                                       _window_gather,
                                       _window_scatter)

_PHI_FLOOR = 1e-24
_THETA_FLOOR = 1e-24


def mmsb_window_working_set_bytes(k: int, t_win: int, b_cap: int,
                                  n_smpl: int, e_cap: int) -> int:
    """K-major VMEM estimate for the MMSB window kernel: the
    persistent operands (gathered rows, phi noise, staged rows,
    component-major theta noise — all K-scaled and T-resident) plus
    the per-step transient [E*K, K] responsibility tensors (~8 live
    at once in the theta stage). The quadratic K^2 transient is what
    bounds usable K (K=64 ~5 MiB, K=128 ~20 MiB, K=256 would blow the
    32 MiB envelope)."""
    persistent = 4 * k * t_win * (b_cap + n_smpl + 2 * b_cap + 2 * k)
    transient = 8 * 4 * e_cap * k * k
    return persistent + transient


def mmsb_max_safe_window(cfg: Config,
                         candidates=(12, 8, 6, 4, 3, 2)) -> int:
    """Largest candidate T whose working set fits the measured-safe
    VMEM envelope (0 if none does — callers fall back to the
    sequential scan)."""
    for t in candidates:
        if mmsb_window_working_set_bytes(
                cfg.K, t, cfg.max_batch_nodes, cfg.num_node_sample,
                cfg.max_batch_edges) <= VMEM_ENVELOPE_BYTES:
            return t
    return 0


def _mmsb_window_kernel(cfg: Config, t_win: int, b_cap: int,
                        e_cap: int, k: int, refs):
    """``t_win`` sequential full-MMSB SGRLD steps in VMEM."""
    (g_ref, sums_ref, yf_ref, mf_ref, nmask_ref, noise_ref,
     tnoise_ref, yef_ref, emask_ref, lu_ref, lv_ref, m_ref, wts_ref,
     epsphi_ref, epstheta_ref, eta_ref, theta_ref,
     rows_out_ref, sums_out_ref, theta_out_ref) = refs
    f32 = jnp.float32
    alpha = cfg.alpha_value
    theta_full = theta_ref[:]                          # [2K, K]
    eta = eta_ref[:]                                   # [2K, K]
    ek = e_cap * k
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (e_cap, b_cap), 1)
    # exact one-hot expanders for the flattened [E*K, K] stage:
    #   R [E*K, E]: row (e,k) -> its edge e     (also selects y/p/mask)
    #   Kx [E*K, K]: row (e,k) -> its k         (expands B/theta rows)
    #   Rt/Kt: the transposed contractions, built directly from iota
    #   (no in-kernel transpose)
    R = (jax.lax.broadcasted_iota(jnp.int32, (ek, e_cap), 0) // k
         == jax.lax.broadcasted_iota(jnp.int32, (ek, e_cap), 1)
         ).astype(f32)
    Kx = (jax.lax.broadcasted_iota(jnp.int32, (ek, k), 0) % k
          == jax.lax.broadcasted_iota(jnp.int32, (ek, k), 1)
          ).astype(f32)
    Rt = (jax.lax.broadcasted_iota(jnp.int32, (e_cap, ek), 1) // k
          == jax.lax.broadcasted_iota(jnp.int32, (e_cap, ek), 0)
          ).astype(f32)
    Kt = (jax.lax.broadcasted_iota(jnp.int32, (k, ek), 1) % k
          == jax.lax.broadcasted_iota(jnp.int32, (k, ek), 0)
          ).astype(f32)
    # staged buffers are read back through 0/1 coefficients; rows not
    # yet written must be zeros, not NaN garbage
    rows_out_ref[:] = jnp.zeros((t_win * b_cap, k), f32)
    sums_out_ref[:] = jnp.zeros((t_win * b_cap, 1), f32)
    for t in range(t_win):
        gt = g_ref[t]                                  # [B+n, K]
        # --- intra-window read redirection (exact one-hot) -----------
        mc = m_ref[t]                                  # [B+n, 1]
        lin = jax.lax.broadcasted_iota(
            jnp.int32, (gt.shape[0], t_win * b_cap), 1)
        m_t = (mc == lin + 1).astype(f32)              # [B+n, T*B]
        rs = (mc > 0).astype(f32)
        g_corr = (jnp.dot(m_t, rows_out_ref[:],
                          preferred_element_type=f32)
                  + (1.0 - rs) * gt)
        phis = (jnp.dot(m_t[:b_cap], sums_out_ref[:],
                        preferred_element_type=f32)
                + (1.0 - rs[:b_cap]) * sums_ref[t])    # [B, 1]
        pi_n = g_corr[:b_cap]                          # [B, K]
        pi_nb = g_corr[b_cap:]                         # [n, K]
        theta0 = theta_full[:k]                        # [K, K]
        theta1 = theta_full[k:]
        b_mat = theta1 / (theta0 + theta1)             # [K, K]
        # --- phi stage (factorized shared-draw MMSB contraction) -----
        g_link = jnp.dot(pi_nb, b_mat.T,
                         preferred_element_type=f32)   # [n, K]
        g_non = jnp.sum(pi_nb, axis=-1, keepdims=True) - g_link
        p_link = jnp.dot(pi_n, g_link.T,
                         preferred_element_type=f32)   # [B, n]
        p_non = jnp.dot(pi_n, g_non.T,
                        preferred_element_type=f32)
        yf = yf_ref[t]                                 # [B, n]
        mf = mf_ref[t]
        p = jnp.where(yf > 0.5, p_link, p_non)
        p = jnp.where(mf > 0.5, p, 1.0)
        inv_p = 1.0 / p
        w_link = yf * inv_p * mf
        w_non = (1.0 - yf) * inv_p * mf
        sc = (jnp.dot(w_link, g_link, preferred_element_type=f32)
              + jnp.dot(w_non, g_non, preferred_element_type=f32))
        n_valid = jnp.sum(mf, axis=1, keepdims=True)   # [B, 1]
        inv_phi = 1.0 / phis
        grads = (sc - n_valid) * inv_phi
        eps_t = epsphi_ref[t, 0]
        phi_k = pi_n * phis
        phi_new = jnp.abs(
            phi_k
            + eps_t / 2.0 * (alpha - phi_k + (cfg.N / n_valid) * grads)
            + jnp.sqrt(eps_t * phi_k) * noise_ref[t])
        phi_new = jnp.maximum(phi_new, _PHI_FLOOR)
        sums_new = jnp.sum(phi_new, axis=-1, keepdims=True)
        rows_new = phi_new / sums_new
        rows_out_ref[t * b_cap:(t + 1) * b_cap, :] = rows_new
        sums_out_ref[t * b_cap:(t + 1) * b_cap, :] = sums_new
        # --- theta stage on the staged rows (flattened [E*K, K]) -----
        nmask = nmask_ref[t]                           # [B, 1]
        rows_safe = jnp.where(nmask > 0.5, rows_new, 1.0 / k)
        oh_u = (lu_ref[t] == lane_iota).astype(f32)    # [E, B]
        oh_v = (lv_ref[t] == lane_iota).astype(f32)
        pi_u = jnp.dot(oh_u, rows_safe,
                       preferred_element_type=f32)     # [E, K]
        pi_v = jnp.dot(oh_v, rows_safe,
                       preferred_element_type=f32)
        rep_u = jnp.dot(R, pi_u,
                        preferred_element_type=f32)    # [EK,K]=pi_u[e,l]
        rep_v = jnp.dot(R, pi_v, preferred_element_type=f32)
        cu = jnp.sum(rep_u * Kx, axis=1,
                     keepdims=True)                    # [EK,1]=pi_u[e,k]
        cv = jnp.sum(rep_v * Kx, axis=1, keepdims=True)
        b_rep = jnp.dot(Kx, b_mat,
                        preferred_element_type=f32)    # [EK,K]=B[k,l]
        y_rep = jnp.dot(R, yef_ref[t],
                        preferred_element_type=f32)    # [EK, 1]
        f_rep = y_rep * b_rep + (1.0 - y_rep) * (1.0 - b_rep)
        num = (cu * rep_v) * f_rep                     # pi_u[e,k]pi_v[e,l]F
        q = jnp.sum(num, axis=1, keepdims=True)
        p_e = jnp.dot(Rt, q, preferred_element_type=f32)  # [E, 1]
        inv_pe = jnp.dot(R, 1.0 / p_e,
                         preferred_element_type=f32)   # [EK, 1]
        th0_rep = jnp.dot(Kx, theta0, preferred_element_type=f32)
        th1_rep = jnp.dot(Kx, theta1, preferred_element_type=f32)
        inv_ts = 1.0 / (th0_rep + th1_rep)
        em = jnp.dot(R, emask_ref[t],
                     preferred_element_type=f32)       # [EK, 1]
        c0 = ((1.0 - y_rep) / th0_rep - inv_ts) * em * inv_pe
        c1 = (y_rep / th1_rep - inv_ts) * em * inv_pe
        g0 = num * c0
        g1 = num * c1
        # swapped-endpoint pass: grad(v,u) == grad(u,v)^T exactly
        # (B and theta symmetric), so the undirected symmetrization
        # 0.5*(g + g^T) needs no in-kernel transpose. f/p/theta terms
        # are symmetric in (k,l) and shared; only the outer product
        # swaps roles.
        num_s = (cv * rep_u) * f_rep
        g0_s = num_s * c0
        g1_s = num_s * c1
        grad0 = 0.5 * (jnp.dot(Kt, g0, preferred_element_type=f32)
                       + jnp.dot(Kt, g0_s,
                                 preferred_element_type=f32))
        grad1 = 0.5 * (jnp.dot(Kt, g1, preferred_element_type=f32)
                       + jnp.dot(Kt, g1_s,
                                 preferred_element_type=f32))
        grads_t = jnp.concatenate([grad0, grad1], axis=0)  # [2K, K]
        eps_b = epstheta_ref[t, 0]
        wt = wts_ref[t, 0, 0]
        theta_full = jnp.abs(
            theta_full
            + eps_b / 2.0 * (eta - theta_full + wt * grads_t)
            + jnp.sqrt(eps_b * theta_full) * tnoise_ref[t])
        theta_full = jnp.maximum(theta_full, _THETA_FLOOR)
    theta_out_ref[:] = theta_full


def mmsb_window_kernel_call(cfg: Config, g, sums, yf, mf, nmask,
                            noise, tnoise, yef, emf, lanes_u, lanes_v,
                            mcode, wts, eps_phi, eps_theta, eta_cm,
                            theta_cm):
    """Invoke the MMSB mega-kernel on prepared per-step operands.

    Shapes (leading axis T = windowed steps): g [T,B+n,K],
    sums [T,B,1], yf/mf [T,B,n], nmask [T,B,1], noise [T,B,K],
    tnoise [T,2K,K] component-major symmetrized theta noise,
    yef/emf [T,E,1], lanes_u/lanes_v [T,E,1] int32 node-lane ids,
    mcode [T,B+n,1] staged-slot redirection codes, wts [T,1,1],
    eps_* [T,1] (SMEM), eta_cm/theta_cm [2K,K] component-major.
    Returns (rows [T*B,K], sums [T*B,1], theta_cm')."""
    t_win, bn, k = g.shape
    b_cap = sums.shape[1]
    e_cap = yef.shape[1]
    n_smpl = bn - b_cap
    ws = mmsb_window_working_set_bytes(k, t_win, b_cap, n_smpl, e_cap)
    if ws > VMEM_ENVELOPE_BYTES:
        raise ValueError(
            f"MMSB window kernel working set ~{ws / 2**20:.0f} MiB "
            f"(K={k}, T={t_win}, B={b_cap}, n={n_smpl}, E={e_cap}) "
            f"exceeds the measured-safe VMEM envelope "
            f"({VMEM_ENVELOPE_BYTES / 2**20:.0f} MiB) — the [E*K, K] "
            "responsibility tensors scale as K^2. Lower window or K "
            "(ops/window_mmsb.mmsb_max_safe_window picks the largest "
            "fitting T), or use window=0.")
    f32 = jnp.float32
    args = [g, sums, yf, mf, nmask, noise, tnoise, yef, emf,
            lanes_u, lanes_v, mcode, wts, eps_phi, eps_theta,
            eta_cm, theta_cm]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vmem] * 13 + [smem] * 2 + [vmem] * 2

    def kernel(*refs):
        _mmsb_window_kernel(cfg, t_win, b_cap, e_cap, k, refs)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_win * b_cap, k), f32),
            jax.ShapeDtypeStruct((t_win * b_cap, 1), f32),
            jax.ShapeDtypeStruct(theta_cm.shape, f32),
        ),
        in_specs=in_specs,
        out_specs=(vmem, vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def mmsb_windowed_scan(cfg: Config, state, xs, body):
    """Scan T-step windows over the hoisted MMSB per-step operands;
    any non-multiple tail runs through the sequential ``body``.

    ``xs`` is mmsb_steps_scan's hoisted operand tuple:
    (batches, neighbors [S,n], y_phi [S,B,n], phi_noise [S,B,K],
     t_noise [S,K,K,2] symmetrized, y_edges [S,E], lanes_u, lanes_v).

    Every window runs the corrected kernel (``window_correction ==
    'always'`` semantics — the a-MMSB measurement that a scatter under
    a lax.cond forces a full [N,K] pi copy applies identically here)."""
    t_win = cfg.window
    s_len = xs[1].shape[0]
    n_win = s_len // t_win
    tail = s_len - n_win * t_win
    if n_win == 0:
        state, _ = jax.lax.scan(body, state, xs, unroll=cfg.scan_unroll)
        return state

    k = cfg.K
    f32 = jnp.float32
    xs_w = jax.tree.map(
        lambda a: a[: n_win * t_win].reshape(n_win, t_win,
                                             *a.shape[1:]), xs)
    # eta with the identifiability prior folded in, component-major —
    # exactly models/mmsb.mmsb_theta_step's eta construction
    eta0 = jnp.full((k, k), cfg.eta0, f32)
    eta1 = jnp.full((k, k), cfg.eta1, f32)
    if cfg.mmsb_prior_diag is not None:
        eye = jnp.eye(k, dtype=bool)
        pd = jnp.asarray(cfg.mmsb_prior_diag, f32)
        eta0 = jnp.where(eye, pd, eta0)
        eta1 = jnp.where(eye, pd, eta1)
    eta_cm = jnp.concatenate([eta0, eta1], axis=0)     # [2K, K]

    def wbody(s, xs_t):
        batch, nbrs, y_w, nphi_w, tn_w, ye_w, lu, lv = xs_t
        with jax.named_scope("window_gather"):
            g, sums_g = _window_gather(cfg, s, batch, nbrs)
        with jax.named_scope("window_correct"):
            mcode = _correction_codes(cfg, batch.nodes,
                                      batch.node_mask, nbrs)
        with jax.named_scope("window_prep"):
            steps = s.step_count + jnp.arange(t_win, dtype=jnp.int32)
            counts = (s.theta_count + 1
                      + jnp.arange(t_win, dtype=jnp.int32))
            eps_phi = cfg.eps_t(steps).astype(f32)[:, None]
            eps_theta = cfg.eps_t(counts).astype(f32)[:, None]
            nbr_mask = (nbrs[:, None, :]
                        != batch.nodes[:, :, None])    # [T, B, n]
            tnoise_cm = jnp.concatenate(
                [tn_w[..., 0], tn_w[..., 1]], axis=1)  # [T, 2K, K]
            theta_cm = jnp.concatenate(
                [s.theta_b[..., 0], s.theta_b[..., 1]], axis=0)
        with jax.named_scope("window_kernel"):
            rows_flat, sums_col, theta_cm_new = mmsb_window_kernel_call(
                cfg, g, sums_g[..., None].astype(f32),
                y_w.astype(f32), nbr_mask.astype(f32),
                batch.node_mask[..., None].astype(f32),
                nphi_w.astype(f32), tnoise_cm.astype(f32),
                ye_w[..., None].astype(f32),
                batch.edge_mask[..., None].astype(f32),
                lu[..., None], lv[..., None], mcode,
                batch.weight[:, None, None].astype(f32),
                eps_phi, eps_theta, eta_cm, theta_cm)
        with jax.named_scope("window_scatter"):
            keep = _last_write_wins(batch.nodes, batch.node_mask,
                                    t_win)
            pi, phi_sum = _window_scatter(cfg, s, batch, keep,
                                          rows_flat, sums_col[:, 0])
        theta_b = jnp.stack([theta_cm_new[:k], theta_cm_new[k:]],
                            axis=-1)
        b = theta_b[..., 1] / theta_b.sum(-1)
        s = s._replace(pi=pi, phi_sum=phi_sum, theta_b=theta_b, b=b,
                       step_count=s.step_count + t_win,
                       theta_count=s.theta_count + t_win)
        return s, None

    state, _ = jax.lax.scan(wbody, state, xs_w)
    if tail:
        xs_tail = jax.tree.map(lambda a: a[n_win * t_win:], xs)
        state, _ = jax.lax.scan(body, state, xs_tail,
                                unroll=cfg.scan_unroll)
    return state
