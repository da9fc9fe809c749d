"""Checkpoint / resume.

The reference serializes every stateful object as length-prefixed
protobufs wrapping raw device-buffer bytes — model arrays, all counters
and timers, RNG seed arrays, the perplexity running averages, and the
in-flight pipelined minibatch — and asserts bit-exact resume
(/root/reference/mcmc/serialize.h, learner.cc:301-361,
serialize-test.cc:90-134).

TPU-native equivalent: the whole ``TrainState`` is a pytree of arrays, so
a checkpoint is one ``savez`` of its leaves plus a JSON manifest of the
config and host-sampler state. jax.random keys are counter-based arrays,
so restoring them restores the exact noise streams; the host sampler's
numpy RandomState pickles losslessly into bytes. Resume is bit-exact
(asserted by tests/test_checkpoint.py, the EndToEnd pattern of
serialize-test.cc).
"""

from __future__ import annotations

import dataclasses
import json
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_ammsb_tpu.config import (Config, EdgeSetBackend, PhiImpl,
                                   RngBackend, SampleStrategy)

_FORMAT_VERSION = 2  # v2: RefRngState gained the neighbor stream array


def _config_to_json(cfg: Config) -> dict:
    d = dataclasses.asdict(cfg)
    d["strategy"] = cfg.strategy.value
    d["phi_impl"] = cfg.phi_impl.value
    d["edgeset_backend"] = cfg.edgeset_backend.value
    d["rng_backend"] = cfg.rng_backend.value
    return d


def _config_from_json(d: dict) -> Config:
    d = dict(d)
    d["strategy"] = SampleStrategy.parse(d["strategy"])
    d["phi_impl"] = PhiImpl(d["phi_impl"])
    d["edgeset_backend"] = EdgeSetBackend(d["edgeset_backend"])
    d["rng_backend"] = RngBackend(d["rng_backend"])
    d["phi_seed"] = tuple(d["phi_seed"])
    d["beta_seed"] = tuple(d["beta_seed"])
    d["neighbor_seed"] = tuple(d["neighbor_seed"])
    return Config(**d)


def save_checkpoint(path: str, learner) -> None:
    """Full-fidelity checkpoint: state pytree + config + the complete
    host-sampling position — the numpy RNG state, the native sampler's
    chunk counter, and any produced-but-unconsumed prefetched batches
    (the in-flight pipeline state; the reference serializes its
    pipelined minibatch identically, learner.cc:307-315).

    Accepts any learner with (cfg, state, timers): Learner,
    parallel.ShardedLearner, and the device-sampling chain engines
    (which have no host sampler — their sampling position is the
    sample_key inside the state pytree)."""
    pending = (learner.drain_sampling()
               if hasattr(learner, "drain_sampling") else [])
    sampler = getattr(learner, "sampler", None)
    leaves, treedef = jax.tree_util.tree_flatten(learner.state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    manifest = {
        "format_version": _FORMAT_VERSION,
        "config": _config_to_json(learner.cfg),
        "learner": type(learner).__name__,
        "num_chains": getattr(learner, "num_chains", None),
        "num_leaves": len(leaves),
        "timers": {k: v for k, v in learner.timers.seconds.items()},
        "timer_calls": {k: v for k, v in learner.timers.calls.items()},
        "native_call_count": getattr(sampler, "_native_call_count", 0),
    }
    sampler_rng = pickle.dumps(
        sampler.rng.get_state() if sampler is not None else None)
    pending_blob = pickle.dumps(pending)
    np.savez_compressed(
        path,
        manifest=np.frombuffer(json.dumps(manifest).encode(), np.uint8),
        sampler_rng=np.frombuffer(sampler_rng, np.uint8),
        pending=np.frombuffer(pending_blob, np.uint8),
        **arrays,
    )


def load_checkpoint(path: str, learner):
    """Restore state into an already-constructed learner (same dataset).

    The graph/split/edge-sets are rebuilt from data (the reference
    likewise reloads the dataset and only restores learner state,
    serialize-test.cc:90-134).
    """
    z = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(z["manifest"]).decode())
    if manifest["format_version"] != _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {manifest['format_version']} != "
            f"{_FORMAT_VERSION}: the state leaf layout changed (v2 added "
            "the reference-backend neighbor RNG stream); re-train or "
            "migrate the checkpoint")
    saved_cfg = _config_from_json(manifest["config"])
    if saved_cfg.K != learner.cfg.K or saved_cfg.N != learner.cfg.N:
        raise ValueError("checkpoint geometry mismatch")
    saved_chains = manifest.get("num_chains")
    if saved_chains != getattr(learner, "num_chains", None):
        raise ValueError(
            f"checkpoint geometry mismatch: num_chains {saved_chains} "
            f"!= {getattr(learner, 'num_chains', None)}")
    _, treedef = jax.tree_util.tree_flatten(learner.state)
    ref_leaves = jax.tree_util.tree_leaves(learner.state)
    if manifest["num_leaves"] != len(ref_leaves):
        raise ValueError(
            f"checkpoint has {manifest['num_leaves']} state leaves, "
            f"learner expects {len(ref_leaves)} (different learner "
            f"class or config: saved by {manifest.get('learner')})")
    leaves = [z[f"leaf_{i}"] for i in range(manifest["num_leaves"])]
    # restore key dtypes exactly (uint32 key arrays)
    leaves = [jnp.asarray(l, r.dtype) for l, r in zip(leaves, ref_leaves)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    if hasattr(learner, "state_spec") and hasattr(learner, "mesh"):
        # ShardedLearner: re-place each leaf on its mesh sharding
        from jax.sharding import NamedSharding

        state = jax.tree_util.tree_map(
            lambda x, spec: jax.device_put(
                x, NamedSharding(learner.mesh, spec)),
            state, learner.state_spec)
    learner.state = state
    sampler = getattr(learner, "sampler", None)
    sampler_rng = pickle.loads(bytes(z["sampler_rng"]))
    if sampler is not None and sampler_rng is not None:
        sampler.rng.set_state(sampler_rng)
        sampler._native_call_count = int(
            manifest.get("native_call_count", 0))
    if "pending" in z and hasattr(learner, "_pending"):
        learner._pending = pickle.loads(bytes(z["pending"]))
    for k, v in manifest.get("timers", {}).items():
        learner.timers.seconds[k] = v
    for k, v in manifest.get("timer_calls", {}).items():
        learner.timers.calls[k] = v
    return learner
