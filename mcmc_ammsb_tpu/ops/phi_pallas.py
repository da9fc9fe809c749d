"""Hand-written Pallas TPU kernel for the phi update.

The jnp path lets XLA schedule the phi math over a materialized
probs [B, n, K]; this kernel instead streams [TB, n, K] neighbor blocks
through VMEM and fuses product, per-neighbor normalization, gradient
accumulation, and the SGRLD write into one pass — probs never exists
outside vector registers. This is the TPU analog of the reference's
shared-memory workgroup mode (PHI_NODE_PER_WORKGROUP_SHARED,
/root/reference/mcmc/phi.cc:305-412: "25% improvement by placing
pi_a/probs/grads in shared memory") — same math as
ops/phi.py:phi_update_core, cross-checked by the same style of golden
equivalence tests the reference uses (wg-phi-test.cc:116-158).

Schedule:
  grid      = (B / TB,) node tiles
  blocks    = pi_n [TB, K], pi_nb [TB, n, K], y [TB, n], phi_b [TB, 1],
              noise [TB, K] in VMEM; beta broadcast [1, K]; eps_t SMEM
  unroll    = static python loop over the n neighbor columns (a config
              constant — Mosaic needs static lane offsets), accumulator
              lives in vector registers

Neighbor rows are gathered by XLA outside the kernel (pi[neighbors]) —
a dense row gather XLA already does at near-bandwidth; the kernel's win
is fusing everything downstream of it. A deeper variant that DMAs rows
straight from HBM inside the kernel (skipping the gathered [B, n, K]
buffer entirely) was built and measured 8x SLOWER on hardware —
XLA's gather wins; see _phi_gather_kernel for the recorded experiment.

Requires K % 128 == 0 (f32 lane tiling); learner.train_step falls back
to the jnp path otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.ops.edgeset import EdgeSet
from mcmc_ammsb_tpu.ops.rowops import row_normalize

_PHI_FLOOR = 1e-24


def _phi_kernel(cfg: Config,
                pi_n_ref, pi_nb_ref, y_ref, phi_b_ref, beta_ref,
                noise_ref, eps_ref, out_ref):
    n = cfg.num_node_sample
    eps = cfg.epsilon

    pi_n = pi_n_ref[:]                       # [TB, K]
    beta = beta_ref[:]                       # [1, K]
    y_all = y_ref[:]                         # [TB, n] f32 (1.0 = link)

    acc = jnp.zeros_like(pi_n)
    for j in range(n):                       # static unroll over neighbors
        yj = y_all[:, j][:, None]                          # [TB, 1]
        f = jnp.where(yj > 0, beta - eps, eps - beta)      # [TB, K]
        e = jnp.where(yj > 0, eps, 1.0 - eps)              # [TB, 1]
        nbr = pi_nb_ref[:, j, :]                           # [TB, K]
        probs = pi_n * (nbr * f + e)                       # [TB, K]
        ps = jnp.sum(probs, axis=1, keepdims=True)         # [TB, 1]
        acc = acc + probs / ps

    phi_b = phi_b_ref[:]                     # [TB, 1]
    eps_t = eps_ref[0]
    grads = acc / (pi_n * phi_b) - np.float32(n) / phi_b
    phi_k = pi_n * phi_b
    phi_new = jnp.abs(
        phi_k
        + eps_t * 0.5 * (np.float32(cfg.alpha_value) - phi_k
                         + np.float32(cfg.N / n) * grads)
        + jnp.sqrt(eps_t * phi_k) * noise_ref[:]
    )
    out_ref[:] = jnp.maximum(phi_new, _PHI_FLOOR)


def _phi_gather_kernel(cfg: Config, tb: int,
                       # scalar prefetch
                       nodes_ref, nbrs_ref,
                       # inputs
                       pi_hbm, phi_b_ref, beta_ref, y_ref, noise_ref,
                       eps_ref,
                       # output
                       out_ref,
                       # scratch
                       node_rows, nbr_rows, node_sems, nbr_sems):
    """Deep-pipelined gather variant — a RECORDED EXPERIMENT, not a
    production mode. Hypothesis: issuing all of a tile's row DMAs
    (TB node rows + TB*n neighbor rows) up front would beat XLA's
    gather (~90ns/row) by keeping the DMA engines saturated. Measured
    on a v5e (DMA-only variant, 64x33 rows of 4KB): 709 ns/row, 6 GB/s
    — 8x SLOWER than XLA's gather. Per-row async_copy descriptor setup
    from a single core dominates; XLA's gather lowering batches
    descriptors far better. Retained for future DMA experiments and
    exercised in interpret mode by tests; the full compute lowering
    also currently trips a Mosaic layout bug (rank-3 unit-dim
    broadcasts), so production paths use phi_update_rows_pallas / jnp.

    Layouts: pi arrives as the [N*(K/128), 128] view so one logical row
    is s = K/128 full sublane tiles — both the dynamic HBM source slice
    (offset idx*s, provably 8-aligned for K % 1024 == 0) and the VMEM
    destinations ([s, 128] blocks) satisfy Mosaic's tile alignment.
    All K-wide math runs in [..., s, 128] form; reductions over K are
    axis (-2, -1) sums."""
    n = cfg.num_node_sample
    eps = cfg.epsilon
    s_tiles = out_ref.shape[1]            # K / 128
    base = pl.program_id(0) * tb

    def row_src(idx):
        return pi_hbm.at[pl.ds(pl.multiple_of(idx * s_tiles, 8), s_tiles), :]

    # issue every DMA for this tile before waiting on any of them
    for i in range(tb):
        pltpu.make_async_copy(
            row_src(nodes_ref[base + i]), node_rows.at[i],
            node_sems.at[i]).start()
    for i in range(tb):
        for j in range(n):
            pltpu.make_async_copy(
                row_src(nbrs_ref[(base + i) * n + j]),
                nbr_rows.at[i, j], nbr_sems.at[i, j]).start()

    for i in range(tb):
        pltpu.make_async_copy(
            row_src(nodes_ref[base + i]), node_rows.at[i],
            node_sems.at[i]).wait()

    pi_n = node_rows[:]                   # [TB, s, 128]
    beta = beta_ref[:]                    # [1, s, 128]
    y_all = y_ref[:]                      # [TB, n]
    acc = jnp.zeros_like(pi_n)
    for j in range(n):
        for i in range(tb):
            pltpu.make_async_copy(
                row_src(nbrs_ref[(base + i) * n + j]),
                nbr_rows.at[i, j], nbr_sems.at[i, j]).wait()
        yj = y_all[:, j][:, None, None]                     # [TB,1,1]
        f = jnp.where(yj > 0, beta - eps, eps - beta)       # [TB,s,128]
        e = jnp.where(yj > 0, eps, 1.0 - eps)               # [TB,1,1]
        nbr = nbr_rows[:, j]                                # [TB,s,128]
        probs = pi_n * (nbr * f + e)
        ps = jnp.sum(probs, axis=(1, 2), keepdims=True)     # [TB,1,1]
        acc = acc + probs / ps

    phi_b = phi_b_ref[:][:, :, None]      # [TB,1,1]
    eps_t = eps_ref[0]
    grads = acc / (pi_n * phi_b) - np.float32(n) / phi_b
    phi_k = pi_n * phi_b
    phi_new = jnp.abs(
        phi_k
        + eps_t * 0.5 * (np.float32(cfg.alpha_value) - phi_k
                         + np.float32(cfg.N / n) * grads)
        + jnp.sqrt(eps_t * phi_k) * noise_ref[:]
    )
    out_ref[:] = jnp.maximum(phi_new, _PHI_FLOOR)


def phi_update_rows_pallas_gather(
    cfg: Config,
    pi: jnp.ndarray,         # [N, K], K % 1024 == 0
    phi_sum: jnp.ndarray,
    beta: jnp.ndarray,
    edge_set: EdgeSet,
    nodes: jnp.ndarray,
    neighbors: jnp.ndarray,
    step_count: jnp.ndarray,
    noise: jnp.ndarray,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-in-kernel phi update (PhiImpl.PALLAS_GATHER)."""
    b = nodes.shape[0]
    k = pi.shape[1]
    nn = cfg.num_node_sample
    if k % 1024 != 0:
        raise ValueError("pallas gather kernel requires K % 1024 == 0, "
                         f"got {k}")
    tb = min(cfg.node_tile, b)
    while b % tb:
        tb -= 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    y = edge_set.has_edges(nodes[:, None], neighbors).astype(pi.dtype)
    phi_b = phi_sum[nodes][:, None]
    eps_t = jnp.asarray(cfg.eps_t(step_count), pi.dtype).reshape(1)
    s = k // 128  # sublane tiles per logical row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),          # pi [N*s, 128]
            pl.BlockSpec((tb, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),         # phi_b
            pl.BlockSpec((1, s, 128), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),         # beta
            pl.BlockSpec((tb, nn), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),         # y
            pl.BlockSpec((tb, s, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),         # noise
            pl.BlockSpec(memory_space=pltpu.SMEM),         # eps_t
        ],
        out_specs=pl.BlockSpec((tb, s, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb, s, 128), pi.dtype),            # node rows
            pltpu.VMEM((tb, nn, s, 128), pi.dtype),        # nbr rows
            pltpu.SemaphoreType.DMA((tb,)),
            pltpu.SemaphoreType.DMA((tb, nn)),
        ],
    )
    phi_new = pl.pallas_call(
        partial(_phi_gather_kernel, cfg, tb),
        out_shape=jax.ShapeDtypeStruct((b, s, 128), pi.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nodes, neighbors.reshape(-1), pi.reshape(-1, 128), phi_b,
      beta.reshape(1, s, 128), y, noise.reshape(b, s, 128), eps_t)
    return row_normalize(phi_new.reshape(b, k))


def phi_update_rows_pallas(
    cfg: Config,
    pi: jnp.ndarray,         # [N, K], K % 128 == 0
    phi_sum: jnp.ndarray,    # [N]
    beta: jnp.ndarray,       # [K]
    edge_set: EdgeSet,
    nodes: jnp.ndarray,      # [B]
    neighbors: jnp.ndarray,  # [B, n]
    step_count: jnp.ndarray,
    noise: jnp.ndarray,      # [B, K]
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas phi update; same contract as ops.phi.phi_update_rows."""
    if pi.shape[1] % 128 != 0:
        raise ValueError("pallas phi kernel requires K % 128 == 0, "
                         f"got {pi.shape[1]}")
    # XLA-side gathers + membership; the kernel fuses everything after
    pi_n = pi[nodes]                                       # [B, K]
    pi_nb = pi[neighbors]                                  # [B, n, K]
    y = edge_set.has_edges(nodes[:, None], neighbors)
    phis = phi_sum[nodes]                                  # [B]
    return phi_update_core_pallas(cfg, pi_n, phis, pi_nb, y, beta,
                                  step_count, noise,
                                  interpret=interpret)


def phi_update_core_pallas(
    cfg: Config,
    pi_n: jnp.ndarray,       # [B, K] gathered pi rows
    phis: jnp.ndarray,       # [B] gathered phi sums
    pi_nb: jnp.ndarray,      # [B, n, K] gathered neighbor rows
    y: jnp.ndarray,          # [B, n] bool edge labels
    beta: jnp.ndarray,       # [K]
    step_count: jnp.ndarray,
    noise: jnp.ndarray,      # [B, K]
    nbr_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel on pre-gathered rows — same contract as
    ops.phi.phi_update_core (including the positional ``nbr_mask``
    slot, so the scan's 9-positional-arg call can never silently bind
    a mask into ``interpret``), so the hoisted scan
    (learner.train_steps_scan) can route through the streaming kernel
    instead of the jnp elementwise chain without giving up hoisting.
    Shared-neighbor masks are a jnp-path feature: the kernel tiles
    per-node neighbor rows, so a non-None mask is rejected loudly
    (the Learner constructor already forbids the combination)."""
    if nbr_mask is not None:
        raise ValueError(
            "phi_update_core_pallas does not support shared-neighbor "
            "masks (shared_neighbors requires phi_impl=jnp)")
    b, k = pi_n.shape
    nn = cfg.num_node_sample
    if k % 128 != 0:
        raise ValueError(f"pallas phi kernel requires K % 128 == 0, got {k}")
    tb = min(cfg.node_tile, b)
    while b % tb:
        tb -= 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    y = y.astype(pi_n.dtype)
    phi_b = phis[:, None]                                  # [B, 1]
    eps_t = jnp.asarray(cfg.eps_t(step_count), pi_n.dtype).reshape(1)

    grid_spec = pl.GridSpec(
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),         # pi_n
            pl.BlockSpec((tb, nn, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),         # pi_nb
            pl.BlockSpec((tb, nn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),         # y
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),         # phi_b
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),         # beta
            pl.BlockSpec((tb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),         # noise
            pl.BlockSpec(memory_space=pltpu.SMEM),         # eps_t
        ],
        out_specs=pl.BlockSpec((tb, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    phi_new = pl.pallas_call(
        partial(_phi_kernel, cfg),
        out_shape=jax.ShapeDtypeStruct((b, k), pi_n.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nn * k,
            bytes_accessed=4 * (b * nn * k + 4 * b * k),
            transcendentals=b * k,
        ),
    )(pi_n, pi_nb, y, phi_b, beta[None, :], noise, eps_t)
    return row_normalize(phi_new)
