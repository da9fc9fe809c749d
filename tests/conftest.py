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

# Persistent XLA compile cache — MUST be set before `import jax` (the
# config reads these env vars at import time). Different tests (and
# the multihost / graft-entry SUBPROCESS tests — env vars inherit,
# config calls don't) re-trace identical programs through fresh
# Learner closures, which miss the in-memory jit cache but hash to
# the same HLO — the on-disk cache dedupes those compiles within one
# suite run and across edit-test iterations. Even a FRESH run (empty
# cache) benefits from the intra-run dedup; a warm rerun skips most
# compiles. Opt out with MCMC_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("MCMC_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "MCMC_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "mcmc_ammsb_tpu_xla"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np
import pytest

import jax  # noqa: E402  (after env setup)

# The env-var route (JAX_PLATFORMS=cpu) is overridden by the axon TPU
# plugin in this image; the config API wins.
jax.config.update("jax_platforms", "cpu")

# The axon sitecustomize imports jax at interpreter start, BEFORE this
# conftest runs — so the cache env vars above were read too late for
# THIS process (they still reach subprocesses, whose jax import sees
# them). Apply the same settings through the config API here.
if not os.environ.get("MCMC_TPU_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
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
