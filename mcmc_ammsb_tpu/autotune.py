"""On-device autotuner for the T-step window size.

The reference exposes its kernel tunables — workgroup sizes, vector
widths, phi modes — as CLI flags the user must pick by hand per device
(/root/reference/main.cc:61-76; the only guidance in the tree is a
comment "Optimal block size for Titan X = 128", mcmc/phi.cc:414-415).
The TPU framework's analog knob is the fused window size T, whose
optimum is shape-dependent (single-chain T=12, C=16 chains T=6,
hub-padded heavy-tail batches prefer T=0 — docs/design.md). The CLI's
``--window 0`` auto mode applies those measured heuristics; this module
replaces the heuristic with a measurement on the ACTUAL device, graph,
and config: probe each candidate for a few thousand steps and keep the
fastest.

Methodology per docs/design.md "Timing on the axon tunnel": each probe
warms its program (compile + first chunk) outside the timed region and
fences the timed region with a scalar step-count readback. Each
candidate costs one compile (~5-40 s on a real TPU), so tuning pays off
for production-length runs; it is opt-in (``--auto-tune-window``).

Trajectory note: the window size does not change the sampler's
semantics — the windowed trajectory is exactly the sequential scan's
(golden tests in tests/test_window.py) — so tuning T is a pure
performance choice.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from mcmc_ammsb_tpu.config import Config, PhiImpl, RngBackend

log = logging.getLogger(__name__)

#: Measured frontier of useful window sizes (docs/design.md round 3:
#: T=12 beat 8/16/20/24/32/50 single-chain; chains peak at T=6-12 with
#: the kernel's VMEM ceiling binding C*T; T=8 sits inside the
#: measured-interesting band and covers the C*T midpoints).
DEFAULT_CANDIDATES = (0, 6, 8, 12, 16)


def window_candidates(cfg: Config, num_chains: int = 1,
                      candidates: Sequence[int] = DEFAULT_CANDIDATES,
                      ) -> List[int]:
    """Candidate window sizes valid for ``cfg`` (always includes 0).

    Mirrors the engine preconditions (learner.py: window > 1 requires
    shared_neighbors + native RNG + jnp phi), the auto-window
    fallback (cli.py: hub-padded batches with max_batch_nodes > 64 —
    the correction contraction scales with T * B_cap, so windows lose
    there at every T), and the kernel's measured VMEM envelope
    (ops/window.py: ~52 MiB working sets FAULT the TPU worker).
    """
    from mcmc_ammsb_tpu.ops.window import (VMEM_ENVELOPE_BYTES,
                                           window_working_set_bytes)

    if (not cfg.device_sampling
            or not cfg.shared_neighbors
            or cfg.rng_backend != RngBackend.NATIVE
            or cfg.phi_impl != PhiImpl.JNP
            or cfg.max_batch_nodes > 64):
        return [0]
    out = [0]
    for t in candidates:
        if t <= 1 or t in out:
            continue
        if window_working_set_bytes(
                cfg.K, t, max(num_chains, 1), cfg.max_batch_nodes,
                cfg.num_node_sample) > VMEM_ENVELOPE_BYTES:
            continue
        out.append(t)
    return out


def probe_rate(make_learner: Callable[[], object],
               probe_steps: int, warm_steps: int,
               clock: Callable[[], float] = time.perf_counter,
               repeats: int = 2,
               ) -> float:
    """Measured updates/s of one engine configuration.

    ``make_learner()`` returns any engine exposing ``run(n)``,
    ``state.step_count`` and ``close()`` (Learner, FlatChainLearner,
    ...). Warmup (compile + first chunk) runs outside the timed
    region; the timed region is fenced by scalar step-count readbacks.

    ``repeats`` timed probes run back-to-back on the one warmed engine
    and the BEST is returned: the documented run-to-run headline
    spread on this hardware is ~±10% (CLAUDE.md), so a single-shot
    probe can invert a ranking; best-of-2 costs no extra compile and
    suppresses one-sided noise (stalls only ever slow a probe down).
    """
    learner = make_learner()
    try:
        learner.run(warm_steps)
        best = 0.0
        for _ in range(max(1, repeats)):
            s0 = int(learner.state.step_count)   # fence
            t0 = clock()
            learner.run(probe_steps)
            steps = int(learner.state.step_count) - s0   # fence
            dt = clock() - t0
            if steps != probe_steps:
                raise RuntimeError(
                    f"probe advanced {steps} steps, "
                    f"expected {probe_steps}")
            best = max(best, steps / dt)
        return best
    finally:
        learner.close()


def tune_window(cfg: Config,
                make_learner: Callable[[Config], object],
                num_chains: int = 1,
                candidates: Optional[Sequence[int]] = None,
                probe_steps: Optional[int] = None,
                warm_steps: Optional[int] = None,
                clock: Callable[[], float] = time.perf_counter,
                ) -> Tuple[Config, Dict[int, Optional[float]]]:
    """Probe each candidate window size and return the fastest config.

    ``make_learner(cfg)`` builds the engine for one candidate (it is
    closed after its probe). A candidate whose build/probe raises is
    recorded as None and skipped — e.g. a window kernel that exceeds
    the device's VMEM at an untested (C, T) point must not kill the
    run. Returns ``(best_cfg, table)`` where table maps window ->
    measured updates/s (per-chain steps/s for chain engines — the
    constant chain count ranks identically to aggregate).
    """
    cands = (window_candidates(cfg, num_chains) if candidates is None
             else list(candidates))
    spc = max(1, cfg.steps_per_call)
    warm = spc if warm_steps is None else warm_steps
    probe = 2 * spc if probe_steps is None else probe_steps
    table: Dict[int, Optional[float]] = {}
    for w in cands:
        cand = cfg.replace(window=w)
        try:
            table[w] = probe_rate(lambda: make_learner(cand),
                                  probe, warm, clock=clock)
            log.info("autotune: window=%d -> %.0f updates/s",
                     w, table[w])
        except Exception as e:   # noqa: BLE001 - candidate must not kill the run
            table[w] = None
            log.warning("autotune: window=%d failed (%s)", w, e)
    measured = {w: r for w, r in table.items() if r is not None}
    if not measured:
        raise RuntimeError(
            f"autotune: every candidate failed ({table})")
    best = max(measured, key=measured.get)
    return cfg.replace(window=best), table
