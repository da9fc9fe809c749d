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
buffer entirely) requires K % 1024 == 0 for provably tile-aligned
dynamic slices; planned for the K>=1024 ladder configs.

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
    b = nodes.shape[0]
    k = pi.shape[1]
    nn = cfg.num_node_sample
    if k % 128 != 0:
        raise ValueError(f"pallas phi kernel requires K % 128 == 0, got {k}")
    tb = min(cfg.node_tile, b)
    while b % tb:
        tb -= 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # XLA-side gathers + membership; the kernel fuses everything after
    pi_n = pi[nodes]                                       # [B, K]
    pi_nb = pi[neighbors]                                  # [B, n, K]
    y = edge_set.has_edges(nodes[:, None], neighbors).astype(pi.dtype)
    phi_b = phi_sum[nodes][:, None]                        # [B, 1]
    eps_t = jnp.asarray(cfg.eps_t(step_count), pi.dtype).reshape(1)

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
        out_shape=jax.ShapeDtypeStruct((b, k), pi.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nn * k,
            bytes_accessed=4 * (b * nn * k + 4 * b * k),
            transcendentals=b * k,
        ),
    )(pi_n, pi_nb, y, phi_b, beta[None, :], noise, eps_t)
    return row_normalize(phi_new)
