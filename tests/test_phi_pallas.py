"""Cross-implementation golden tests: Pallas phi kernel vs jnp path.

The TPU analog of the reference's cross-mode equivalence tests
(wg-phi-test.cc:116-158: THREAD vs WORKGROUP modes must agree with
noise disabled). Here both implementations consume identical noise
arrays, so agreement is to fp32 tolerance, noise enabled or not.
Runs in Pallas interpret mode on CPU; the same kernel compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_ammsb_tpu.config import Config, EdgeSetBackend
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.ops import phi as phi_ops
from mcmc_ammsb_tpu.ops.edgeset import build_edge_set
from mcmc_ammsb_tpu.ops.phi_pallas import phi_update_rows_pallas


@pytest.fixture(scope="module", params=[128, 256])
def pallas_fixture(request):
    k = request.param
    n_nodes = 200
    n, u, v = synthetic_edges(n_nodes, 10, seed=5)
    graph = Graph.from_edges(n, u, v)
    cfg = Config(K=k, mini_batch_size=8, num_node_sample=8, node_tile=4)
    cfg = cfg.finalize(n, len(u), graph.max_fan_out)
    rng = np.random.RandomState(0)
    pi_raw = rng.gamma(1.0, 1.0, size=(n, k)).astype(np.float32)
    phi_sum = pi_raw.sum(-1)
    pi = pi_raw / phi_sum[:, None]
    beta = rng.rand(k).astype(np.float32) * 0.5
    es = build_edge_set(EdgeSetBackend.CSR, n, graph.edges_u, graph.edges_v)
    return cfg, pi, phi_sum, beta, es


@pytest.mark.parametrize("b", [8, 12])
def test_pallas_matches_jnp(pallas_fixture, b):
    _run_pallas_match(pallas_fixture, b, node_tile=None)


@pytest.mark.parametrize("tile", [2, 3, 5, 8])
def test_pallas_tile_sizes(pallas_fixture, tile):
    """Parametrize the block size incl. non-powers-of-2 — the pattern
    of the reference's wg-size sweeps (wg-sum-test.cc:22-130,
    wg-phi-test.cc parametrized wg in {32..256})."""
    _run_pallas_match(pallas_fixture, 12, node_tile=tile)


def _run_pallas_match(pallas_fixture, b, node_tile):
    cfg, pi, phi_sum, beta, es = pallas_fixture
    if node_tile is not None:
        cfg = cfg.replace(node_tile=node_tile)
    rng = np.random.RandomState(7)
    nodes = rng.choice(cfg.N, b, replace=False).astype(np.int32)
    neighbors = rng.randint(0, cfg.N, size=(b, cfg.num_node_sample)
                            ).astype(np.int32)
    noise = rng.randn(b, cfg.K).astype(np.float32)
    args = (jnp.asarray(pi), jnp.asarray(phi_sum), jnp.asarray(beta), es,
            jnp.asarray(nodes), jnp.asarray(neighbors),
            jnp.asarray(3, jnp.int32), jnp.asarray(noise))

    rows_ref, sums_ref = jax.jit(
        lambda *a: phi_ops.phi_update_rows(cfg, *a))(*args)
    rows_pl, sums_pl = jax.jit(
        lambda *a: phi_update_rows_pallas(cfg, *a, interpret=True))(*args)

    np.testing.assert_allclose(np.asarray(rows_pl), np.asarray(rows_ref),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sums_pl), np.asarray(sums_ref),
                               rtol=2e-5)


def test_pallas_rejects_unaligned_k():
    cfg = Config(K=48).finalize(100, 100, 4)
    with pytest.raises(ValueError, match="128"):
        phi_update_rows_pallas(
            cfg, jnp.ones((100, 48)), jnp.ones(100), jnp.ones(48),
            None, jnp.zeros(8, jnp.int32), jnp.zeros((8, 4), jnp.int32),
            jnp.asarray(1), jnp.ones((8, 48)))


def test_gather_kernel_interpret_matches_jnp():
    """The DMA-gather experiment must stay numerically exact (interpret
    mode; on-hardware it is a recorded negative result, see module doc)."""
    from mcmc_ammsb_tpu.ops.phi_pallas import phi_update_rows_pallas_gather
    from mcmc_ammsb_tpu.data import Graph, synthetic_edges

    k = 1024
    n, u, v = synthetic_edges(200, 8, seed=13)
    graph = Graph.from_edges(n, u, v)
    cfg = Config(K=k, mini_batch_size=8, num_node_sample=4, node_tile=4)
    cfg = cfg.finalize(n, len(u), graph.max_fan_out)
    rng = np.random.RandomState(1)
    pi_raw = rng.gamma(1.0, 1.0, size=(n, k)).astype(np.float32)
    phi_sum = pi_raw.sum(-1)
    pi = pi_raw / phi_sum[:, None]
    beta = rng.rand(k).astype(np.float32) * 0.5
    es = build_edge_set(EdgeSetBackend.CSR, n, graph.edges_u, graph.edges_v)
    b = 8
    nodes = rng.choice(n, b, replace=False).astype(np.int32)
    nbrs = rng.randint(0, n, size=(b, 4)).astype(np.int32)
    noise = rng.randn(b, k).astype(np.float32)
    args = (jnp.asarray(pi), jnp.asarray(phi_sum), jnp.asarray(beta), es,
            jnp.asarray(nodes), jnp.asarray(nbrs),
            jnp.asarray(3, jnp.int32), jnp.asarray(noise))
    r1 = jax.jit(lambda *a: phi_ops.phi_update_rows(cfg, *a))(*args)
    r2 = jax.jit(lambda *a: phi_update_rows_pallas_gather(
        cfg, *a, interpret=True))(*args)
    np.testing.assert_allclose(np.asarray(r2[0]), np.asarray(r1[0]),
                               rtol=2e-5, atol=1e-8)


def test_gather_kernel_rejects_unaligned_k():
    from mcmc_ammsb_tpu.ops.phi_pallas import phi_update_rows_pallas_gather
    cfg = Config(K=256).finalize(100, 100, 4)
    with pytest.raises(ValueError, match="1024"):
        phi_update_rows_pallas_gather(
            cfg, jnp.ones((100, 256)), jnp.ones(100), jnp.ones(256),
            None, jnp.zeros(8, jnp.int32), jnp.zeros((8, 4), jnp.int32),
            jnp.asarray(1), jnp.ones((8, 256)))
