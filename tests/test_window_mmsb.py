"""MMSB windowed Pallas mega-kernel (ops/window_mmsb.py): golden
tests against the sequential MMSB scan — the cross-mode validation
pattern of the reference (wg-phi-test.cc:116-158) applied to the
full-blockmodel window engine.

The small graph (N=300, B=8) makes intra-window collisions FREQUENT,
so the one-hot staged-row redirection is exercised where it is
hardest, not on collision-free data (same design as test_window.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
from mcmc_ammsb_tpu.models.mmsb import FullMMSBLearner


def make_pair(n_nodes=300, window=4, seed=9, **kw):
    n, u, v = synthetic_edges(n_nodes, 8, seed=seed)
    split = generate_sets(n, u, v, heldout_ratio=0.1, seed=seed + 1)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    base = dict(K=8, mini_batch_size=8, num_node_sample=8,
                steps_per_call=24, device_sampling=True,
                shared_neighbors=True)
    base.update(kw)
    cfg = Config(**base).finalize(n, split.total_edges,
                                  graph.max_fan_out)
    seq = FullMMSBLearner(cfg, graph, split)
    win = FullMMSBLearner(cfg.replace(window=window), graph, split)
    return cfg, seq, win


@pytest.mark.parametrize("window", [2, 4, 8])
def test_mmsb_windowed_matches_sequential(window):
    """The windowed kernel (interpret mode on CPU; the same kernel
    compiles for TPU) reproduces the sequential scan's trajectory on
    collision-heavy data, including a non-dividing tail at T=8
    (24 % 8 == 0 covers the no-tail case; T=5 below covers tails)."""
    cfg, seq, win = make_pair(window=window)
    seq.run(24)
    win.run(24)
    assert int(win.state.step_count) == int(seq.state.step_count)
    assert int(win.state.theta_count) == int(seq.state.theta_count)
    np.testing.assert_allclose(np.asarray(win.state.pi),
                               np.asarray(seq.state.pi),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(win.state.theta_b),
                               np.asarray(seq.state.theta_b),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(win.state.b),
                               np.asarray(seq.state.b),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(win.heldout_perplexity(),
                               seq.heldout_perplexity(), rtol=1e-5)


def test_mmsb_windowed_tail_steps():
    """Steps not divisible by T: the tail runs sequentially and the
    trajectory still matches."""
    cfg, seq, win = make_pair(window=5)
    seq.run(23)
    win.run(23)
    assert int(win.state.step_count) == int(seq.state.step_count)
    np.testing.assert_allclose(np.asarray(win.state.pi),
                               np.asarray(seq.state.pi),
                               rtol=2e-5, atol=1e-8)


def test_mmsb_windowed_theta_stays_symmetric():
    """The kernel's swapped-endpoint symmetrization keeps theta_b
    exactly symmetric — the invariant the undirected likelihood
    depends on (models/mmsb.py:94-104)."""
    cfg, seq, win = make_pair(window=4)
    win.run(24)
    th = np.asarray(win.state.theta_b)
    np.testing.assert_array_equal(th, th.transpose(1, 0, 2))


def test_mmsb_windowed_prior_diag():
    """The identifiability prior (mmsb_prior_diag) rides into the
    kernel's eta operand — trajectories match the sequential scan
    with the knob set."""
    cfg, seq, win = make_pair(window=4, mmsb_prior_diag=3.0)
    seq.run(12)
    win.run(12)
    np.testing.assert_allclose(np.asarray(win.state.theta_b),
                               np.asarray(seq.state.theta_b),
                               rtol=2e-5, atol=1e-8)


def test_mmsb_windowed_odd_shapes():
    """Non-power-of-two shape sweep (the reference tests its kernels
    at ragged sizes, wg-sum-test.cc:22-130): padding/masking off the
    friendly tiles must not change the trajectory."""
    cfg, seq, win = make_pair(window=3, K=12, mini_batch_size=5,
                              num_node_sample=7, steps_per_call=12)
    seq.run(12)
    win.run(12)
    np.testing.assert_allclose(np.asarray(win.state.pi),
                               np.asarray(seq.state.pi),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(win.state.theta_b),
                               np.asarray(seq.state.theta_b),
                               rtol=2e-5, atol=1e-8)


def test_mmsb_window_large_k_falls_back():
    """K past the VMEM envelope (the [E*K,K] responsibility tensors
    scale as K^2) silently runs the sequential scan — same trajectory,
    no kernel."""
    from mcmc_ammsb_tpu.ops.window_mmsb import mmsb_max_safe_window

    n, u, v = synthetic_edges(300, 8, seed=9)
    split = generate_sets(n, u, v, heldout_ratio=0.1, seed=10)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=2048, mini_batch_size=32, num_node_sample=32,
                 steps_per_call=4, device_sampling=True,
                 shared_neighbors=True, window=12
                 ).finalize(n, split.total_edges, graph.max_fan_out)
    assert mmsb_max_safe_window(cfg, (cfg.window,)) == 0

    cfg64 = Config(K=64, mini_batch_size=32, num_node_sample=32,
                   steps_per_call=4, device_sampling=True,
                   shared_neighbors=True, window=12
                   ).finalize(n, split.total_edges, graph.max_fan_out)
    assert mmsb_max_safe_window(cfg64, (cfg64.window,)) == 12


def test_mmsb_windowed_ppx_series_matches():
    """run_with_ppx rides the windowed scan: the eval series matches
    the sequential engine's."""
    cfg, seq, win = make_pair(window=4)
    s1 = seq.run_with_ppx(24, 6)
    s2 = win.run_with_ppx(24, 6)
    assert [e["step"] for e in s1] == [e["step"] for e in s2]
    for e1, e2 in zip(s1, s2):
        np.testing.assert_allclose(e2["ppx"], e1["ppx"], rtol=1e-5)
