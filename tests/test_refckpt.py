"""Reference-checkpoint interop (refckpt.py): round-trip on a
synthetically written reference-format file (VERDICT r3 #9) — the
byte layout of /root/reference/mcmc/serialize.h:13-113 +
learner.cc:301-330, parsed without protoc by the minimal wire codec.
"""

import numpy as np

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.refckpt import (parse_fields, encode_bytes,
                                    encode_double, encode_varint,
                                    read_reference_checkpoint,
                                    to_train_state,
                                    write_reference_checkpoint)


def test_wire_codec_roundtrip():
    msg = (encode_varint(1, 12345) + encode_double(2, -3.5)
           + encode_bytes(3, b"\x00\x01payload")
           + encode_varint(4, 2**40))
    fields = parse_fields(msg)
    assert fields[1] == [12345]
    assert fields[2] == [-3.5]
    assert fields[3] == [b"\x00\x01payload"]
    assert fields[4] == [2**40]


def _fake_state(n=50, k=8, h=12, seed=0):
    rng = np.random.RandomState(seed)
    pi = rng.dirichlet(np.ones(k), size=n).astype(np.float32)
    phi = rng.gamma(2.0, 1.0, size=n).astype(np.float32)
    theta = rng.gamma(1.0, 1.0, size=(k, 2)).astype(np.float32)
    beta = (theta[:, 1] / theta.sum(-1)).astype(np.float32)
    ppx = rng.uniform(0.1, 0.9, size=h).astype(np.float32)
    seeds = rng.randint(0, 2**31, size=(64, 4)).astype(np.uint32)
    return dict(pi=pi, phi_sum=phi, theta=theta, beta=beta,
                ppx_per_edge=ppx, phi_seeds=seeds,
                beta_seeds=seeds[::-1].copy())


def test_reference_checkpoint_roundtrip(tmp_path):
    st = _fake_state()
    path = str(tmp_path / "ref.ckpt")
    write_reference_checkpoint(
        path, theta=st["theta"], beta=st["beta"], pi=st["pi"],
        phi_sum=st["phi_sum"], ppx_per_edge=st["ppx_per_edge"],
        phi_seeds=st["phi_seeds"], beta_seeds=st["beta_seeds"],
        step_count=321, beta_count=320, phi_count=320, ppx_count=4,
        weight=50.0)
    raw = read_reference_checkpoint(path)
    np.testing.assert_array_equal(raw["pi"], st["pi"])
    np.testing.assert_array_equal(raw["phi_sum"], st["phi_sum"])
    np.testing.assert_array_equal(raw["theta"], st["theta"])
    np.testing.assert_array_equal(raw["beta"], st["beta"])
    np.testing.assert_array_equal(raw["ppx_per_edge"],
                                  st["ppx_per_edge"])
    # rng seed buffers survive the ulong2 <-> uint32[4] conversion
    np.testing.assert_array_equal(raw["phi_seeds"], st["phi_seeds"])
    np.testing.assert_array_equal(raw["beta_seeds"], st["beta_seeds"])
    assert raw["step_count"] == 321
    assert raw["beta_count"] == 320
    assert raw["ppx_count"] == 4
    assert raw["weight"] == 50.0
    # interleaved layouts match the reference accessors
    np.testing.assert_array_equal(raw["beta_interleaved"][1::2],
                                  st["beta"])


def test_reference_checkpoint_multi_block_rpm(tmp_path):
    """pi split across several row blocks (the RowPartitionedMatrix
    case the format exists for, partitioned-alloc.h:87-120) parses to
    the same matrix."""
    st = _fake_state(n=53, k=8)   # ragged last block
    path = str(tmp_path / "ref_rpm.ckpt")
    write_reference_checkpoint(
        path, theta=st["theta"], beta=st["beta"], pi=st["pi"],
        phi_sum=st["phi_sum"], ppx_per_edge=st["ppx_per_edge"],
        phi_seeds=st["phi_seeds"], beta_seeds=st["beta_seeds"],
        rows_in_block=16)
    raw = read_reference_checkpoint(path)
    np.testing.assert_array_equal(raw["pi"], st["pi"])


def test_reference_checkpoint_into_train_state(tmp_path):
    """The importer produces a TrainState the evaluator accepts: a
    Learner scoring held-out perplexity on the imported state runs and
    carries the imported counters."""
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner

    n, u, v = synthetic_edges(50, 6, seed=4)
    split = generate_sets(n, u, v, heldout_ratio=0.2, seed=5)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=8, mini_batch_size=4, num_node_sample=4).finalize(
        n, split.total_edges, graph.max_fan_out)
    h = len(split.heldout_edges_u)

    st = _fake_state(n=n, k=8, h=h)
    path = str(tmp_path / "ref_state.ckpt")
    write_reference_checkpoint(
        path, theta=st["theta"], beta=st["beta"], pi=st["pi"],
        phi_sum=st["phi_sum"], ppx_per_edge=st["ppx_per_edge"],
        phi_seeds=st["phi_seeds"], beta_seeds=st["beta_seeds"],
        step_count=100, beta_count=99, ppx_count=2)
    raw = read_reference_checkpoint(path)
    state = to_train_state(cfg, raw, h)
    assert int(state.step_count) == 100
    assert int(state.ppx_count) == 2
    np.testing.assert_array_equal(np.asarray(state.pi), st["pi"])

    lrn = Learner(cfg, graph, split, prefetch=False)
    lrn.state = state
    ppx = lrn.heldout_perplexity()
    assert np.isfinite(ppx)
    assert int(lrn.state.ppx_count) == 3   # running average continued
    lrn.run(4)
    assert int(lrn.state.step_count) == 104
    lrn.close()


def test_export_reference_checkpoint_roundtrip(tmp_path):
    """export_reference_checkpoint (the --checkpoint-ref twin) writes a
    trained TrainState in the reference's byte layout; reading it back
    reproduces every exported array and counter, and importing it into
    a fresh Learner continues the run."""
    from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges
    from mcmc_ammsb_tpu.learner import Learner
    from mcmc_ammsb_tpu.refckpt import export_reference_checkpoint

    n, u, v = synthetic_edges(60, 6, seed=8)
    split = generate_sets(n, u, v, heldout_ratio=0.2, seed=9)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    cfg = Config(K=8, mini_batch_size=4, num_node_sample=4,
                 steps_per_call=5).finalize(
        n, split.total_edges, graph.max_fan_out)
    lrn = Learner(cfg, graph, split, prefetch=False)
    lrn.run(10)
    lrn.heldout_perplexity()
    path = str(tmp_path / "export.ckpt")
    export_reference_checkpoint(path, cfg, lrn.state)

    raw = read_reference_checkpoint(path)
    np.testing.assert_array_equal(raw["pi"], np.asarray(lrn.state.pi))
    np.testing.assert_array_equal(raw["phi_sum"],
                                  np.asarray(lrn.state.phi_sum))
    np.testing.assert_array_equal(raw["theta"],
                                  np.asarray(lrn.state.theta))
    np.testing.assert_array_equal(raw["beta"],
                                  np.asarray(lrn.state.beta))
    np.testing.assert_array_equal(raw["ppx_per_edge"],
                                  np.asarray(lrn.state.ppx_per_edge))
    assert raw["step_count"] == int(lrn.state.step_count)
    assert raw["beta_count"] == int(lrn.state.beta_count)
    assert raw["ppx_count"] == int(lrn.state.ppx_count)
    # native backend: the seed-law initial buffers (seed_i = base + i)
    assert raw["phi_seeds"].shape == (cfg.max_batch_nodes, 4)

    # the exported file resumes in a FRESH learner at the same state
    state = to_train_state(cfg, raw, len(split.heldout_edges_u))
    lrn2 = Learner(cfg, graph, split, prefetch=False)
    lrn2.state = state
    assert int(lrn2.state.step_count) == int(lrn.state.step_count)
    lrn2.run(5)
    assert int(lrn2.state.step_count) == int(lrn.state.step_count) + 5
    lrn.close(); lrn2.close()
