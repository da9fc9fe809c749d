"""Per-stage attribution of the PRODUCTION fused program.

The reference times every kernel launch with device events and prints
true per-stage seconds/% (/root/reference/mcmc/learner.cc:252-299,
mcmc/phi.cc:755-762). Our production step is ONE fused XLA program, so
per-stage truth requires a profiler trace, not host walls: this module
runs a traced production chunk under ``jax.profiler.trace`` and
aggregates the device-plane per-op durations by the ``jax.named_scope``
stage annotations embedded in the step functions (learner.py).

Attribution sources, in order:
  * the ``tf_op`` arg on device-plane op events (present on TPU) — the
    full ``jit(...)/scope/.../op`` path;
  * an op->scope map parsed from the optimized HLO's ``op_name``
    metadata (the CPU runtime's thunk events carry only ``hlo_op``).

Ops that XLA fused ACROSS stage boundaries are attributed to the stage
of the fusion's representative op — shares are exact for device time,
approximate for stage identity (that is the price of fusion; the
reference pays the dual price of 7+ serialized launches instead).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import tempfile
from typing import Callable, Dict, Iterable, Optional

# production stage scopes (annotated in learner.py / parallel/sharded.py)
STAGE_NAMES = (
    "device_sampling",
    "neighbor_draws",
    "membership",
    "noise",
    "edge_lanes",
    "pi_gather",
    "phi_update",
    "pi_scatter",
    "beta_grads",
    "theta_update",
    "ppx",
    # device-sampling sub-scopes (ops/device_sampling.py)
    "ds_link",
    "ds_nonlink",
    "ds_extract_nodes",
    # windowed-engine scopes (ops/window.py, chains_flat.py)
    "window_gather",
    "window_correct",
    "window_prep",
    "window_lanes",
    "window_dirty",
    "window_kernel",
    "window_body",
    "window_scatter",
)

_HLO_META_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=.*metadata=\{[^}]*"
    r"op_name=\"([^\"]+)\"", re.M)


def hlo_op_scope_map(hlo_text: str) -> Dict[str, str]:
    """op name -> op_name metadata path, from optimized HLO text."""
    return {m.group(1): m.group(2)
            for m in _HLO_META_RE.finditer(hlo_text)}


def _stage_of(path: Optional[str], stages: Iterable[str]) -> str:
    if path:
        for part in reversed(path.split("/")):
            name = part.split(":")[0]
            if name in stages:
                return name
    return "other"


def _leaf_events(evs: list) -> list:
    """Keep only LEAF events of one thread's timeline.

    XLA op timelines nest: a lax.scan compiles to a `while` op whose
    event spans the whole loop while its body ops are emitted as
    children inside that span — summing both double-counts every scan
    body. Events on one thread form a stack by (start, end) nesting;
    anything that contains another event is a container, not a kernel.
    """
    evs = sorted(evs, key=lambda e: (e["ts"], -e["dur"]))
    out = []
    stack = []  # (end_ts, event, is_parent flag index into out/None)
    parents = set()
    for e in evs:
        start, end = e["ts"], e["ts"] + e["dur"]
        while stack and stack[-1][0] <= start + 1e-9:
            stack.pop()
        if stack:
            parents.add(id(stack[-1][1]))
        stack.append((end, e))
    return [e for e in evs if id(e) not in parents]


def _load_latest_trace(trace_dir: str) -> dict:
    paths = sorted(glob.glob(
        trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise RuntimeError(f"no trace written under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def profile_trace(
    run: Callable[[], None],
    hlo_text: Optional[str] = None,
    stages: Iterable[str] = STAGE_NAMES,
) -> dict:
    """Trace ``run()`` (it must FENCE its device work — a scalar
    readback, not block_until_ready; see bench.py) and return

      {"stages": {stage: seconds}, "total_op_seconds": s,
       "module_seconds": s_or_None, "source": "tf_op"|"hlo"|"none"}

    ``module_seconds`` is the sum of whole-XLA-module device events
    (TPU "XLA Modules" line) — the true device wall; per-op sums can
    differ slightly where async ops overlap.
    """
    trace_dir = tempfile.mkdtemp(prefix="mcmc_stage_prof_")
    import jax

    with jax.profiler.trace(trace_dir):
        run()
    t = _load_latest_trace(trace_dir)
    events = t["traceEvents"]

    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev_pids = {p for p, n in pids.items() if "/device:" in n}

    op_map = hlo_op_scope_map(hlo_text) if hlo_text else {}
    per_stage = collections.defaultdict(float)
    total = 0.0
    module_s = 0.0
    saw_tf_op = saw_hlo = False

    # collect candidate op events per thread timeline
    per_thread = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        args = e.get("args", {})
        thread = tids.get((e["pid"], e.get("tid")))
        if e["pid"] in dev_pids:
            if thread == "XLA Modules":
                module_s += e["dur"] * 1e-6
                continue
            if thread not in ("XLA Ops", "Async XLA Ops"):
                continue
        else:
            # CPU runtime: thunk events on the host plane carry hlo_op;
            # skip everything else (python, runtime bookkeeping)
            if "hlo_op" not in args or e["name"].startswith("end:"):
                continue
        per_thread[(e["pid"], e.get("tid"))].append(e)

    for evs in per_thread.values():
        for e in _leaf_events(evs):
            args = e.get("args", {})
            dur_s = e["dur"] * 1e-6
            path = args.get("tf_op")
            if path:
                saw_tf_op = True
            else:
                op = args.get("hlo_op", e["name"])
                path = op_map.get(op) or op_map.get(op.lstrip("%"))
                if path:
                    saw_hlo = True
            per_stage[_stage_of(path, stages)] += dur_s
            total += dur_s

    source = "tf_op" if saw_tf_op else ("hlo" if saw_hlo else "none")
    return {
        "stages": dict(per_stage),
        "total_op_seconds": total,
        "module_seconds": module_s or None,
        "source": source,
    }


def format_stage_table(prof: dict, steps: int, log=print) -> None:
    """PrintStats-style table (learner.cc:252-299) from a trace profile:
    per-step microseconds and share of device time per stage."""
    total = prof["total_op_seconds"]
    if total <= 0:
        log("stage profile: no device ops captured")
        return
    mod = prof.get("module_seconds")
    log(f"fused per-step stage profile over {steps} steps "
        f"(device-op time; attribution={prof['source']})")
    for stage, s in sorted(prof["stages"].items(), key=lambda kv: -kv[1]):
        log(f"{stage.upper():16s}: {s / steps * 1e6:9.2f} us/step "
            f"(%{100 * s / total:5.1f})")
    log(f"{'TOTAL OPS':16s}: {total / steps * 1e6:9.2f} us/step")
    if mod:
        log(f"{'TOTAL MODULE':16s}: {mod / steps * 1e6:9.2f} us/step")
