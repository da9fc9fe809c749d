"""Test harness: run on 8 virtual CPU devices.

Mirrors the reference's ContextTest fixture role
(/root/reference/mcmc/test.h:10-52) — every test gets a real (virtual)
device mesh; sharding tests use all 8.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest

import jax  # noqa: E402  (after env setup)

# The env-var route (JAX_PLATFORMS=cpu) is overridden by the axon TPU
# plugin in this image; the config API wins.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: different tests (and the multihost
# subprocess tests) re-trace identical programs through fresh Learner
# closures, which miss the in-memory jit cache but hash to the same
# HLO — the on-disk cache dedupes those compiles within one suite run
# and across edit-test iterations. A FRESH run (empty cache) pays
# full compile cost; CLAUDE.md quotes both times. Opt out with
# MCMC_TPU_NO_COMPILE_CACHE=1 (e.g. when measuring fresh-run time).
if not os.environ.get("MCMC_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "MCMC_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "mcmc_ammsb_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from mcmc_ammsb_tpu.config import Config
from mcmc_ammsb_tpu.data import Graph, generate_sets, synthetic_edges


@pytest.fixture(scope="session")
def small_dataset():
    """Synthetic graph in the spirit of wg-phi-test.cc:116-125."""
    n, u, v = synthetic_edges(num_nodes=400, avg_degree=16, seed=7)
    split = generate_sets(n, u, v, heldout_ratio=0.2, seed=3)
    graph = Graph.from_edges(n, split.training_u, split.training_v)
    return n, split, graph


@pytest.fixture(scope="session")
def small_config(small_dataset):
    n, split, graph = small_dataset
    cfg = Config(K=16, mini_batch_size=8, num_node_sample=8)
    return cfg.finalize(n, split.total_edges, graph.max_fan_out)
