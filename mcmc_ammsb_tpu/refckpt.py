"""Reference-checkpoint interop: read (and, for tests/tooling, write)
the reference implementation's length-prefixed protobuf checkpoints.

Byte layout reproduced from /root/reference/mcmc/serialize.h:13-113 —
each message rides as a native-endian uint64 byte count followed by
the protobuf payload — with the stream order of Learner::Serialize
(/root/reference/mcmc/learner.cc:301-330):

    VectorStorage beta [2K] f32      (beta-of-k lives at [2k+1],
                                      learner.cc:28-30)
    VectorStorage theta [2K] f32     (interleaved (k,0),(k,1) pairs)
    RpmProperties + one VectorStorage per pi row block
                                     (partitioned-alloc.h:87-120)
    VectorStorage phi [N] f32
    phiUpdater:  VectorStorage rng seeds (ulong2 LE) + PhiProperties
                                     (phi.cc:765-771)
    betaUpdater: VectorStorage rng seeds + VectorStorage theta_sum [K]
                 + BetaProperties    (beta.cc:386-397)
    [trainingPerplexity, only with MCMC_CALC_TRAIN_PPX]
    heldoutPerplexity: PerplexityProperties + VectorStorage
                 ppx_per_edge [H]    (perplexity.cc:276-283)
    LearnerProperties                (protos.proto:44-50)
    samples[0] (+ samples[1] with MCMC_SAMPLE_PARALLEL):
                 SampleStorage + dev_edges + dev_nodes +
                 neighbor sampler rng + hash data (sample.h:30-75)

The protobuf messages (protos.proto:1-50) are simple enough that this
module carries its own minimal wire-format codec — no protoc, no
generated code. The reader is the cross-implementation bridge: the day
a real reference GPU run exists, its checkpoint loads into a
TrainState and trajectory comparison is possible; the writer exists so
the round-trip is testable (and so OUR states can be handed to the
reference binary).

Mapping into TrainState (learner.py):
    theta[k, c]   = theta_ref[2k + c]
    beta[k]       = beta_ref[2k + 1]
    pi            = concatenated RPM blocks, reshaped [N, K]
    phi_sum       = phi_ref [N]
    ppx_per_edge / ppx_count, step_count, beta_count as counted.
RNG seed buffers are returned both raw (ulong2 little-endian bytes)
and split into this repo's uint32 [S, 4] = (x_hi, x_lo, y_hi, y_lo)
layout (rng/reference.py).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Minimal protobuf wire codec (proto2; the messages use only varint,
# 64-bit, and length-delimited fields)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _write_varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def parse_fields(buf: bytes) -> Dict[int, List]:
    """Decode a message into {field_number: [values]}; bytes for
    length-delimited, int for varint, float for 64-bit (double)."""
    fields: Dict[int, List] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            (val,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos: pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def _field(tag: int, wire: int) -> bytes:
    return _write_varint(tag << 3 | wire)


def encode_bytes(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + _write_varint(len(payload)) + payload


def encode_varint(tag: int, x: int) -> bytes:
    return _field(tag, 0) + _write_varint(int(x))


def encode_double(tag: int, x: float) -> bytes:
    return _field(tag, 1) + struct.pack("<d", float(x))


# ---------------------------------------------------------------------------
# Length-prefixed stream (SerializeMessage / ParseMessage)
# ---------------------------------------------------------------------------


def read_message(f) -> bytes:
    hdr = f.read(8)
    if len(hdr) < 8:
        raise EOFError("truncated checkpoint (message header)")
    (n,) = struct.unpack("<Q", hdr)
    buf = f.read(n)
    if len(buf) < n:
        raise EOFError("truncated checkpoint (message body)")
    return buf


def write_message(f, payload: bytes) -> None:
    f.write(struct.pack("<Q", len(payload)))
    f.write(payload)


def _read_vector(f, dtype) -> np.ndarray:
    fields = parse_fields(read_message(f))
    return np.frombuffer(fields[1][0], dtype=dtype).copy()


def _write_vector(f, arr: np.ndarray) -> None:
    write_message(f, encode_bytes(1, np.ascontiguousarray(arr).tobytes()))


def _seeds_to_u32(raw: np.ndarray) -> np.ndarray:
    """ulong2 LE buffer -> this repo's uint32 [S, 4]
    (x_hi, x_lo, y_hi, y_lo) layout (rng/reference.py)."""
    u64 = raw.view(np.uint64).reshape(-1, 2)
    out = np.empty((u64.shape[0], 4), np.uint32)
    out[:, 0] = (u64[:, 0] >> np.uint64(32)).astype(np.uint32)
    out[:, 1] = (u64[:, 0] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 2] = (u64[:, 1] >> np.uint64(32)).astype(np.uint32)
    out[:, 3] = (u64[:, 1] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return out


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def read_reference_checkpoint(path: str,
                              with_train_ppx: bool = False) -> dict:
    """Parse a reference-format checkpoint into numpy arrays +
    counters. Reads through LearnerProperties; the trailing Sample
    sections (in-flight minibatch buffers) are returned as raw message
    payloads without interpretation."""
    out: dict = {}
    with open(path, "rb") as f:
        beta2k = _read_vector(f, np.float32)
        theta2k = _read_vector(f, np.float32)

        rpm = parse_fields(read_message(f))
        rows, cols = rpm[1][0], rpm[2][0]
        rows_in_block = rpm[3][0]
        n_blocks = -(-rows // rows_in_block)
        blocks = [_read_vector(f, np.float32) for _ in range(n_blocks)]
        pi = np.concatenate(blocks).reshape(rows, cols)

        phi = _read_vector(f, np.float32)

        phi_seeds_raw = _read_vector(f, np.uint8)
        phi_props = parse_fields(read_message(f))

        beta_seeds_raw = _read_vector(f, np.uint8)
        theta_sum = _read_vector(f, np.float32)
        beta_props = parse_fields(read_message(f))

        if with_train_ppx:
            tprops = parse_fields(read_message(f))
            out["train_ppx_count"] = tprops[1][0]
            out["train_ppx_per_edge"] = _read_vector(f, np.float32)

        hprops = parse_fields(read_message(f))
        ppx_per_edge = _read_vector(f, np.float32)

        lprops = parse_fields(read_message(f))

        trailing = []
        while True:
            try:
                trailing.append(read_message(f))
            except EOFError:
                break

    k = len(beta2k) // 2
    out.update(
        beta=beta2k[1::2].copy(),              # beta-of-k = [2k+1]
        beta_interleaved=beta2k,
        theta=theta2k.reshape(k, 2).copy(),    # (k,0),(k,1) pairs
        pi=pi, phi_sum=phi,
        theta_sum=theta_sum,
        phi_seeds=_seeds_to_u32(phi_seeds_raw),
        beta_seeds=_seeds_to_u32(beta_seeds_raw),
        phi_count=phi_props[1][0],
        beta_count=beta_props[1][0],
        ppx_count=hprops[1][0],
        ppx_per_edge=ppx_per_edge,
        step_count=lprops[1][0],
        phase=lprops.get(4, [0])[0],
        weight=lprops.get(5, [0.0])[0],
        trailing_messages=trailing,
    )
    return out


def to_train_state(cfg, raw: dict, heldout_size: Optional[int] = None):
    """Map a parsed reference checkpoint onto a fresh TrainState (the
    RNG keys/seeds stay at their constructed values: the reference's
    xorshift states are importable via raw['phi_seeds'] for runs on
    the REFERENCE backend whose lane count matches)."""
    import jax.numpy as jnp

    from mcmc_ammsb_tpu.learner import init_state

    h = (heldout_size if heldout_size is not None
         else len(raw["ppx_per_edge"]))
    state = init_state(cfg, h)
    rows = raw["pi"].astype(np.float32)
    return state._replace(
        pi=jnp.asarray(rows, state.pi.dtype),
        phi_sum=jnp.asarray(raw["phi_sum"], state.phi_sum.dtype),
        theta=jnp.asarray(raw["theta"], jnp.float32),
        beta=jnp.asarray(raw["beta"], jnp.float32),
        step_count=jnp.asarray(raw["step_count"], jnp.int32),
        beta_count=jnp.asarray(raw["beta_count"], jnp.int32),
        ppx_per_edge=jnp.asarray(raw["ppx_per_edge"][:h], jnp.float32),
        ppx_count=jnp.asarray(raw["ppx_count"], jnp.int32),
    )


# ---------------------------------------------------------------------------
# Writer (test/tooling twin of Learner::Serialize)
# ---------------------------------------------------------------------------


def export_reference_checkpoint(path: str, cfg, state) -> None:
    """Write this repo's TrainState in the reference's OWN byte layout
    (the inverse of ``to_train_state``): a run trained here resumes
    under the reference binary (learner.cc:301-330 deserialize).

    RNG seed buffers: with the REFERENCE backend the live xorshift
    stream positions are exported as-is (bit-exact continuation); the
    native backend has no xorshift streams, so the seed-law initial
    buffers are written (seed_i = base + i, random.cc:19-28 — the
    deterministic state the reference would have constructed itself).
    """
    from mcmc_ammsb_tpu.rng import reference as ref

    if getattr(state, "ref_seeds", None) is not None:
        phi_seeds = np.asarray(state.ref_seeds.phi)
        beta_seeds = np.asarray(state.ref_seeds.beta)
    else:
        phi_seeds = np.asarray(ref.make_seeds(cfg.phi_seed,
                                              cfg.max_batch_nodes))
        beta_seeds = np.asarray(ref.make_seeds(cfg.beta_seed, cfg.K))
    write_reference_checkpoint(
        path,
        theta=np.asarray(state.theta, np.float32),
        beta=np.asarray(state.beta, np.float32),
        # sharded pi rows are padded to the mesh width; the reference
        # file stores exactly N (bf16 storage upcasts losslessly)
        pi=np.asarray(state.pi, np.float32)[: cfg.N],
        phi_sum=np.asarray(state.phi_sum, np.float32)[: cfg.N],
        ppx_per_edge=np.asarray(state.ppx_per_edge, np.float32),
        phi_seeds=phi_seeds, beta_seeds=beta_seeds,
        step_count=int(state.step_count),
        beta_count=int(state.beta_count),
        phi_count=max(0, int(state.step_count) - 1),
        ppx_count=int(state.ppx_count),
    )


def _u32_to_seeds(seeds: np.ndarray) -> bytes:
    u64 = np.empty((len(seeds), 2), np.uint64)
    s = seeds.astype(np.uint64)
    u64[:, 0] = (s[:, 0] << np.uint64(32)) | s[:, 1]
    u64[:, 1] = (s[:, 2] << np.uint64(32)) | s[:, 3]
    return u64.tobytes()


def write_reference_checkpoint(
        path: str, *, theta: np.ndarray, beta: np.ndarray,
        pi: np.ndarray, phi_sum: np.ndarray,
        ppx_per_edge: np.ndarray,
        phi_seeds: np.ndarray, beta_seeds: np.ndarray,
        theta_sum: Optional[np.ndarray] = None,
        rows_in_block: Optional[int] = None,
        step_count: int = 1, beta_count: int = 0, phi_count: int = 0,
        ppx_count: int = 0, weight: float = 0.0,
        sample_messages: Tuple[bytes, ...] = ()) -> None:
    """Emit the reference's exact byte layout from this repo's state
    arrays (theta [K,2], beta [K], pi [N,K], phi_sum [N], seeds
    uint32 [S,4]). ``rows_in_block`` defaults to all rows in one
    block (the reference computes it from the device's max allocation,
    partitioned-alloc.h:90-97 — any block split parses identically)."""
    n, k = pi.shape
    theta2k = np.asarray(theta, np.float32).reshape(2 * k)
    beta2k = np.zeros(2 * k, np.float32)
    beta2k[1::2] = np.asarray(beta, np.float32)
    beta2k[0::2] = 1.0 - np.asarray(beta, np.float32)  # normalize pair
    rib = rows_in_block or n
    if theta_sum is None:
        theta_sum = np.asarray(theta, np.float32).sum(-1)
    with open(path, "wb") as f:
        _write_vector(f, beta2k)
        _write_vector(f, theta2k)
        write_message(f, encode_varint(1, n) + encode_varint(2, k)
                      + encode_varint(3, rib))
        for lo in range(0, n, rib):
            _write_vector(f, np.ascontiguousarray(
                pi[lo: lo + rib], np.float32))
        _write_vector(f, np.asarray(phi_sum, np.float32))
        # phi updater: rng seeds + props
        write_message(f, encode_bytes(1, _u32_to_seeds(phi_seeds)))
        write_message(f, encode_varint(1, phi_count)
                      + encode_double(2, 0.0) + encode_double(3, 0.0))
        # beta updater: rng seeds + theta_sum + props
        write_message(f, encode_bytes(1, _u32_to_seeds(beta_seeds)))
        _write_vector(f, np.asarray(theta_sum, np.float32))
        write_message(f, encode_varint(1, beta_count)
                      + b"".join(encode_double(t, 0.0)
                                 for t in (2, 3, 4, 5, 6)))
        # heldout perplexity: props + running averages
        write_message(f, encode_varint(1, ppx_count)
                      + encode_double(2, 0.0) + encode_double(3, 0.0))
        _write_vector(f, np.asarray(ppx_per_edge, np.float32))
        # learner properties
        write_message(f, encode_varint(1, step_count)
                      + encode_varint(2, 0) + encode_varint(3, 0)
                      + encode_varint(4, 0) + encode_double(5, weight))
        for msg in sample_messages:
            write_message(f, msg)
