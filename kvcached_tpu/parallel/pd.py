"""Prefill/decode disaggregation: ship a prefilled sequence's KV pages to a
decode engine.

The reference's PD story is NIXL compatibility (vllm/nixl_compat.py:44-197:
make kvcached tensors registrable so the connector can RDMA KV between
prefill and decode workers).  Owning the engine, we implement the transfer
itself, TPU-style:

- **Metadata** (tokens, sampling, page count) frames over the same
  unix-socket plane as the page-table broadcast (`parallel/ipc.py`).
- **Payload**: the sequence's physical pages gathered from the prefill
  pool.  Across processes/hosts the payload rides the socket (stand-in for
  DCN/ICI RDMA); within one process, `LLMEngine.import_sequence` lands it
  in the decode pool through the Pallas page writer (an XLA scatter feeding
  a pallas operand cannot alias — writes must go through kernels).

The handoff is page-granular and exact: the decode engine continues the
sequence bit-identically to an engine that had prefilled locally
(acceptance mirrors the reference's md5 determinism gate).
"""

from __future__ import annotations

import json
import os
import socket
import struct
from dataclasses import dataclass

import numpy as np

from ..logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)


@dataclass
class GroupPayload:
    """One layer group's live pages (hybrid models: sliding-window groups
    reclaim pages mid-sequence, so the handoff carries only the live ones
    plus their positions in the sequence's block row)."""

    indices: list[int]  # positions of live pages in the block row
    n_slots: int  # full block-row length (dead entries stay None)
    k: np.ndarray  # [L_arena, n_live, KH, page_tokens, D]
    v: np.ndarray


@dataclass
class SeqHandoff:
    """Everything a decode engine needs to adopt a prefilled sequence.

    Payloads may be numpy arrays (socket plane) or jax arrays (device
    plane, ``export_sequence(device=True)``): ``to_wire`` gathers lazily,
    and ``import_sequence`` device_puts either kind."""

    prompt: list[int]
    tokens: list[int]  # prompt + tokens generated so far (≥ 1 from prefill)
    max_new_tokens: int
    temperature: float
    stop_token_ids: tuple
    payload_k: np.ndarray | None  # [L, n_pages, KH, page_tokens, D]
    payload_v: np.ndarray | None  # None for MLA single-buffer pools
    #: stateful (mamba) models: packed super cell [L_mamba, cell_elems] f32
    payload_state: np.ndarray | None = None
    #: hybrid multi-group models: per-group live pages (payload_k/v None)
    payload_groups: list[GroupPayload] | None = None

    # ---- wire format: json header + raw ndarray buffers -------------------

    def to_wire(self) -> bytes:
        first = (
            self.payload_k
            if self.payload_k is not None else self.payload_groups[0].k
        )
        first = np.asarray(first)
        header = {
            "prompt": self.prompt,
            "tokens": self.tokens,
            "max_new_tokens": self.max_new_tokens,
            "temperature": self.temperature,
            "stop_token_ids": list(self.stop_token_ids),
            "k_dtype": first.dtype.name,  # name survives bf16/fp8
            "k_shape": (
                list(np.asarray(self.payload_k).shape)
                if self.payload_k is not None else None
            ),
            "has_v": self.payload_v is not None,
            "state_shape": (
                list(self.payload_state.shape)
                if self.payload_state is not None else None
            ),
            "groups": (
                [
                    {
                        "indices": list(g.indices),
                        "n_slots": g.n_slots,
                        "shape": list(np.asarray(g.k).shape),
                    }
                    for g in self.payload_groups
                ]
                if self.payload_groups is not None else None
            ),
        }
        hj = json.dumps(header).encode()
        parts = [struct.pack("<I", len(hj)), hj]
        if self.payload_k is not None:
            parts.append(
                np.ascontiguousarray(np.asarray(self.payload_k)).tobytes()
            )
        if self.payload_v is not None:
            parts.append(
                np.ascontiguousarray(np.asarray(self.payload_v)).tobytes()
            )
        if self.payload_state is not None:
            parts.append(
                np.ascontiguousarray(
                    np.asarray(self.payload_state, np.float32)
                ).tobytes()
            )
        if self.payload_groups is not None:
            for g in self.payload_groups:
                parts.append(np.ascontiguousarray(np.asarray(g.k)).tobytes())
                parts.append(np.ascontiguousarray(np.asarray(g.v)).tobytes())
        return b"".join(parts)

    @classmethod
    def from_wire(cls, data: bytes) -> "SeqHandoff":
        (hlen,) = struct.unpack_from("<I", data, 0)
        header = json.loads(data[4 : 4 + hlen])
        off = 4 + hlen
        try:
            dt = np.dtype(header["k_dtype"])
        except TypeError:
            import ml_dtypes

            dt = np.dtype(getattr(ml_dtypes, header["k_dtype"]))

        def take(shape, dtype):
            nonlocal off
            n = int(np.prod(shape)) * dtype.itemsize
            arr = np.frombuffer(data[off : off + n], dtype).reshape(shape)
            off += n
            return arr

        payload_k = payload_v = None
        if header.get("k_shape") is not None:
            shape = tuple(header["k_shape"])
            payload_k = take(shape, dt)
            if header["has_v"]:
                payload_v = take(shape, dt)
        payload_state = None
        if header.get("state_shape") is not None:
            payload_state = take(
                tuple(header["state_shape"]), np.dtype(np.float32)
            )
        payload_groups = None
        if header.get("groups") is not None:
            payload_groups = []
            for g in header["groups"]:
                shape = tuple(g["shape"])
                payload_groups.append(GroupPayload(
                    indices=list(g["indices"]),
                    n_slots=int(g["n_slots"]),
                    k=take(shape, dt),
                    v=take(shape, dt),
                ))
        return cls(
            prompt=list(header["prompt"]),
            tokens=list(header["tokens"]),
            max_new_tokens=int(header["max_new_tokens"]),
            temperature=float(header["temperature"]),
            stop_token_ids=tuple(header["stop_token_ids"]),
            payload_k=payload_k,
            payload_v=payload_v,
            payload_state=payload_state,
            payload_groups=payload_groups,
        )


def _send_frame(sock: socket.socket, data: bytes) -> None:
    sock.sendall(struct.pack("<Q", len(data)) + data)


def _recv_frame(sock: socket.socket) -> bytes:
    buf = b""
    while len(buf) < 8:
        chunk = sock.recv(8 - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    (n,) = struct.unpack("<Q", buf)
    out = bytearray()
    while len(out) < n:
        chunk = sock.recv(min(1 << 20, n - len(out)))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        out += chunk
    return bytes(out)


class PDDecodeServer:
    """Decode-side endpoint: adopts handoffs into its engine, decodes to
    completion, returns the generated tokens."""

    def __init__(self, engine, path: str):
        self.engine = engine
        self.path = path
        if os.path.exists(path):
            os.unlink(path)
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(path)
        self._srv.listen(4)

    def serve_one(self, timeout: float = 60.0) -> list[int]:
        """Accept one handoff, decode it to completion, reply with the
        output tokens.  Returns them locally too."""
        self._srv.settimeout(timeout)
        conn, _ = self._srv.accept()
        try:
            handoff = SeqHandoff.from_wire(_recv_frame(conn))
            req_id = self.engine.import_sequence(handoff)
            while self.engine.has_unfinished():
                self.engine.step()
            out = next(
                o for o in self.engine.finished_outputs if o.req_id == req_id
            )
            _send_frame(conn, json.dumps(out.output_tokens).encode())
            return out.output_tokens
        finally:
            conn.close()

    def close(self) -> None:
        self._srv.close()
        if os.path.exists(self.path):
            os.unlink(self.path)


class PDPrefillClient:
    """Prefill-side endpoint: ships a handoff, waits for the result."""

    def __init__(self, path: str):
        self.path = path

    def ship(self, handoff: SeqHandoff, timeout: float = 60.0) -> list[int]:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(timeout)
        try:
            s.connect(self.path)
            _send_frame(s, handoff.to_wire())
            return list(json.loads(_recv_frame(s)))
        finally:
            s.close()
