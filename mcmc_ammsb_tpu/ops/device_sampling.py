"""On-device minibatch sampling for the fully-fused training loop.

The reference samples minibatches on the host inside a std::async
pipeline (mcmc/learner.cc:216-246, strategies mcmc/sample.cc:241-302).
With the whole train step fused under lax.scan, host sampling becomes
the only per-step host round-trip; this module moves the random-node
strategies onto the device so hundreds of SGRLD steps run as ONE
dispatch with zero host involvement (``Config.device_sampling``).

Implemented strategies (the Node family; the breadth-first family is
queue-driven and stays on the host — SURVEY.md §2 #13):

  NodeLink    — one random non-isolated node, all of its training
                edges, weight N          (sample.cc:253-268)
  NodeNonLink — m distinct non-links at one random node, excluding
                training and held-out edges, weight 2E/m
                (sample.cc:275-293)
  Node        — fair coin between the two (sample.cc:295-302)

Requires the CSR edge-set backend (its offsets/cols arrays double as
the device adjacency). NodeNonLink performs ``rounds`` vectorized
rejection passes; lanes still colliding afterwards are masked out of
the batch (probability < (m/N + density)^rounds per lane) instead of
looping indefinitely — a bounded-work deviation from the reference's
unbounded host rejection loop, noted in the class docs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mcmc_ammsb_tpu.config import Config, SampleStrategy
from mcmc_ammsb_tpu.ops.edgeset import EdgeSet


class DeviceSample(NamedTuple):
    edges_u: jnp.ndarray    # [E_cap] int32
    edges_v: jnp.ndarray
    edge_mask: jnp.ndarray  # [E_cap] bool
    nodes: jnp.ndarray      # [B_cap] int32 (deduped; padded with N)
    node_mask: jnp.ndarray  # [B_cap] bool
    weight: jnp.ndarray     # scalar f32


def _extract_nodes(cfg: Config, eu, ev, mask):
    """Deduplicate endpoints on device (ExtractNodesFromMiniBatch,
    learner.cc:162-173). Padded lanes map to the sentinel N, which
    sorts last and is dropped by the scatter."""
    sentinel = jnp.int32(cfg.N)
    ids = jnp.concatenate([
        jnp.where(mask, eu, sentinel),
        jnp.where(mask, ev, sentinel),
    ])
    uniq = jnp.unique(ids, size=cfg.max_batch_nodes, fill_value=sentinel)
    return uniq, uniq != sentinel


def _sample_node_link(cfg: Config, csr_offsets, csr_cols, key):
    e_cap = cfg.max_batch_edges

    def draw(carry):
        key, _ = carry
        key, sub = jax.random.split(key)
        u = jax.random.randint(sub, (), 0, cfg.N, dtype=jnp.int32)
        return key, u

    def isolated(carry):
        _, u = carry
        return csr_offsets[u + 1] == csr_offsets[u]

    key, u0 = draw((key, jnp.int32(0)))
    _, u = jax.lax.while_loop(isolated, draw, (key, u0))

    start = csr_offsets[u]
    deg = csr_offsets[u + 1] - start
    idx = start + jnp.arange(e_cap, dtype=jnp.int32)
    valid = jnp.arange(e_cap) < deg
    v = csr_cols[jnp.clip(idx, 0, csr_cols.shape[0] - 1)]
    eu = jnp.minimum(u, v)
    ev = jnp.maximum(u, v)
    weight = jnp.float32(cfg.N)
    return eu, ev, valid, weight


def _sample_node_non_link(cfg: Config, training_set: EdgeSet,
                          heldout_set: EdgeSet, key, rounds: int = 4):
    m = cfg.mini_batch_size
    e_cap = cfg.max_batch_edges
    keys = jax.random.split(key, rounds + 2)
    u = jax.random.randint(keys[0], (), 0, cfg.N, dtype=jnp.int32)
    v = jax.random.randint(keys[1], (m,), 0, cfg.N, dtype=jnp.int32)

    def bad_lanes(v):
        a = jnp.minimum(u, v)
        b = jnp.maximum(u, v)
        hit = (training_set.has_edges(a, b) | heldout_set.has_edges(a, b))
        dup = jnp.any(
            (v[:, None] == v[None, :])
            & jnp.tril(jnp.ones((m, m), jnp.bool_), -1),
            axis=-1,
        )
        return (v == u) | hit | dup

    def fixup(i, v):
        redraw = jax.random.randint(
            jax.random.fold_in(keys[2], i), (m,), 0, cfg.N, jnp.int32)
        return jnp.where(bad_lanes(v), redraw, v)

    v = jax.lax.fori_loop(0, rounds, fixup, v)
    ok = ~bad_lanes(v)                    # residual collisions masked out
    eu = jnp.minimum(u, v)
    ev = jnp.maximum(u, v)
    pad = e_cap - m
    if pad:
        eu = jnp.pad(eu, (0, pad))
        ev = jnp.pad(ev, (0, pad))
        ok = jnp.pad(ok, (0, pad))
    weight = jnp.float32(2.0 * cfg.E / m)
    return eu, ev, ok, weight


def sample_minibatch_device(
    cfg: Config,
    training_set: EdgeSet,
    heldout_set: EdgeSet,
    key: jax.Array,
) -> DeviceSample:
    """Draw one minibatch on device according to cfg.strategy."""
    if training_set.backend != "csr":
        raise ValueError("device sampling requires the CSR edge-set "
                        f"backend, got {training_set.backend!r}")
    csr_offsets, csr_cols = training_set.arrays
    key, coin_key = jax.random.split(key)

    def link(key):
        return _sample_node_link(cfg, csr_offsets, csr_cols, key)

    def non_link(key):
        return _sample_node_non_link(cfg, training_set, heldout_set, key)

    if cfg.strategy == SampleStrategy.NODE_LINK:
        eu, ev, mask, weight = link(key)
    elif cfg.strategy == SampleStrategy.NODE_NON_LINK:
        eu, ev, mask, weight = non_link(key)
    elif cfg.strategy == SampleStrategy.NODE:
        eu, ev, mask, weight = jax.lax.cond(
            jax.random.bernoulli(coin_key), link, non_link, key)
    else:
        raise ValueError(
            f"strategy {cfg.strategy} is host-only (breadth-first "
            "sampling is queue-driven); disable device_sampling")

    nodes, node_mask = _extract_nodes(cfg, eu, ev, mask)
    return DeviceSample(eu, ev, mask, nodes, node_mask, weight)
