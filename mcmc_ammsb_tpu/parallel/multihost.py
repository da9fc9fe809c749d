"""Multi-host (pod-scale) execution scaffolding.

The reference is single-process (SURVEY.md §2: no distributed backend);
this module provides the TPU-native multi-host story for the
com-Friendster-scale rung of the config ladder (BASELINE.md):
`jax.distributed` process initialization, a global ('data', 'model')
mesh spanning every host, and host-local dataset ingestion so each
process touches only its slice of a billion-edge graph.

Design (not executable in this single-host image; the sharded step in
parallel/sharded.py is topology-agnostic and runs unchanged on a global
mesh — GSPMD routes the 'model' psum/all_gather over ICI within a
slice and DCN across slices):

  * every process calls ``initialize()`` then ``global_mesh()``;
  * pi rows are sharded over the global 'model' axis — a v5e-256 pod
    holds N x K = 65M x 4096 fp32 (~1 TB) at 4 GB/chip;
  * graph ETL: each host parses its byte-range of the edge list with
    the native parser (csrc/sampler.cpp), renumbers against a shared
    vocabulary, and builds only the CSR rows its model shards own;
    minibatch node ids travel as replicated host callbacks exactly as
    in the single-host path (batches are kilobytes).
"""

from __future__ import annotations

from typing import Optional

import jax

from mcmc_ammsb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    On Cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(n_model: Optional[int] = None) -> jax.sharding.Mesh:
    """('data', 'model') mesh over ALL processes' devices.

    The model axis is kept within a host's devices when possible so pi
    row fetches (psum over 'model') ride ICI; the data axis then spans
    hosts and only the small gradient psums cross DCN.
    """
    devices = jax.devices()  # global across processes
    n = len(devices)
    per_host = max(1, jax.local_device_count())
    if n_model is None:
        n_model = min(per_host, 4)
        while n % n_model:
            n_model //= 2
    n_data = n // n_model
    return jax.make_mesh((n_data, n_model), (DATA_AXIS, MODEL_AXIS),
                         devices=devices)
