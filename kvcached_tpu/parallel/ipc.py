"""Cross-process page-table broadcast (reference: kvcached/tp_ipc_util.py).

Within one host a single JAX process controls every chip, so TP page-table
mirroring is free (one host table serves all shards — parallel/mesh.py).
This module covers the cases where the mapping must cross *process*
boundaries, exactly like the reference's socket plane:

- multi-host serving (one runtime process per host, sharded pool over DCN/ICI),
- external prefill/decode disaggregation workers,
- any sidecar that needs a live mirror of virtual→physical mappings.

Design mirrors the reference (socket dir per IPC name, one socket per rank,
PP-namespaced subdirs, 4-byte-length framing, asyncio fan-out with per-rank
error aggregation — tp_ipc_util.py:35-246), with two changes:

- payloads are fixed struct + raw int32 arrays, not pickle (no code
  execution on the receiving side), and
- every broadcast is acknowledged, preserving the reference's invariant
  that a page is mapped on **all ranks** before its block ids are handed
  out (map stays off the decode critical path via the prealloc thread,
  which is the broadcast's caller).

Transports: AF_UNIX within a host (the reference's only mode) and TCP with
TCP_NODELAY across hosts — the multi-host DCN control plane the reference
lacks (single-node only, SURVEY §2f).  A TCP listener publishes its bound
``host:port`` as ``w{rank}.addr`` in the same socket dir, so discovery by
IPC name keeps working on a shared filesystem; otherwise pass explicit
``endpoints`` to the broadcaster (e.g. from the launch YAML).
"""

from __future__ import annotations

import asyncio
import hashlib
import os
import socket
import struct
import threading
from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from ..logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)

# ops
OP_MAP = 1
OP_UNMAP = 2
OP_QUERY_READY = 3
OP_SET_READY = 4

_HDR = struct.Struct("<BI")  # op, n_pages
_ACK = struct.Struct("<bI")  # status (1 ok / 0 err), detail


def socket_dir(ipc_name: str, pp_rank: int = 0) -> str:
    """Reference layout: /tmp/kvcached-tp-<ipc>-<hash8>/[pp{n}/]w{rank}.sock
    with the 108-char sun_path guard (tp_ipc_util.py:16-53)."""
    h = hashlib.blake2b(ipc_name.encode(), digest_size=4).hexdigest()
    base = f"/tmp/kvcached-tpu-{ipc_name[:24]}-{h}"
    if pp_rank:
        base = os.path.join(base, f"pp{pp_rank}")
    return base


def socket_path(ipc_name: str, rank: int, pp_rank: int = 0) -> str:
    path = os.path.join(socket_dir(ipc_name, pp_rank), f"w{rank}.sock")
    if len(path) >= 108:
        raise ValueError(f"socket path too long ({len(path)} >= 108): {path}")
    return path


def address_path(ipc_name: str, rank: int, pp_rank: int = 0) -> str:
    """Published ``host:port`` of a TCP listener (multi-host discovery on a
    shared filesystem; same dir convention as the unix sockets)."""
    return os.path.join(socket_dir(ipc_name, pp_rank), f"w{rank}.addr")


def _advertise_host(bind_host: str) -> str:
    """Routable address to publish for a TCP listener.  A specific bind
    host is its own advertisement; a wildcard bind resolves to
    $KVCACHED_ADVERTISE_HOST, else the host's outbound-route IP (UDP
    connect trick — no packet is sent), else a hostname lookup, else
    loopback (single-host fallback)."""
    if bind_host not in ("0.0.0.0", ""):
        return bind_host
    env = os.environ.get("KVCACHED_ADVERTISE_HOST")
    if env:
        return env
    try:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.connect(("8.8.8.8", 80))
            return s.getsockname()[0]
    except OSError:
        pass
    try:
        return socket.gethostbyname(socket.gethostname())
    except OSError:
        return "127.0.0.1"


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


@dataclass
class WorkerListener:
    """Worker-side mirror: applies map/unmap messages to a local page table
    (reference worker listener thread, tp_ipc_util.py:96-145)."""

    ipc_name: str
    rank: int
    page_table: np.ndarray  # int32 mirror, caller-owned
    pp_rank: int = 0
    on_map: Callable[[np.ndarray, np.ndarray], None] | None = None
    on_unmap: Callable[[np.ndarray, np.ndarray], None] | None = None
    #: bind TCP instead of AF_UNIX (cross-host DCN plane).  port 0 =
    #: ephemeral.  Binds 0.0.0.0 (all interfaces) unless ``host`` narrows
    #: it; publishes ``advertise_host:port`` as w{rank}.addr — a loopback
    #: bind would publish an unroutable address to remote brokers
    tcp: bool = False
    host: str = "0.0.0.0"
    port: int = 0
    #: address other hosts should dial (defaults: $KVCACHED_ADVERTISE_HOST,
    #: else this host's outbound-route IP, else hostname lookup)
    advertise_host: str | None = None

    def __post_init__(self):
        self._ready = threading.Event()
        self._stop = threading.Event()
        d = socket_dir(self.ipc_name, self.pp_rank)
        os.makedirs(d, exist_ok=True)
        if self.tcp:
            self.path = None
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind((self.host, self.port))
            port = self._sock.getsockname()[1]
            adv = self.advertise_host or _advertise_host(self.host)
            self.address = f"{adv}:{port}"
            self._addr_file = address_path(
                self.ipc_name, self.rank, self.pp_rank
            )
            with open(self._addr_file, "w") as f:
                f.write(self.address)
        else:
            self.address = None
            self._addr_file = None
            self.path = socket_path(self.ipc_name, self.rank, self.pp_rank)
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.bind(self.path)
        self._sock.listen(8)
        self._sock.settimeout(0.2)
        self._thread = threading.Thread(
            target=self._serve, name=f"kvc-worker-{self.rank}", daemon=True
        )
        self._thread.start()

    def set_ready(self) -> None:
        """Worker announces its pool tensors exist (the analogue of
        kv_tensors_created)."""
        self._ready.set()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            if self.tcp:
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            with conn:
                while True:
                    hdr = _recv_exact(conn, _HDR.size)
                    op, n = _HDR.unpack(hdr)
                    if op in (OP_MAP, OP_UNMAP):
                        body = _recv_exact(conn, 8 * n)
                        arr = np.frombuffer(body, np.int32).reshape(2, n)
                        vpages, ppages = arr[0], arr[1]
                        if op == OP_MAP:
                            self.page_table[vpages] = ppages
                            if self.on_map:
                                self.on_map(vpages, ppages)
                        else:
                            self.page_table[vpages] = 0
                            if self.on_unmap:
                                self.on_unmap(vpages, ppages)
                        conn.sendall(_ACK.pack(1, n))
                    elif op == OP_QUERY_READY:
                        conn.sendall(_ACK.pack(1 if self._ready.is_set() else 0, 0))
                    elif op == OP_SET_READY:
                        self._ready.set()
                        conn.sendall(_ACK.pack(1, 0))
                    else:
                        conn.sendall(_ACK.pack(0, 0))
                        return
        except (ConnectionError, OSError):
            return

    def close(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        finally:
            for p in (self.path, self._addr_file):
                if p is not None:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass


class PageTableBroadcaster:
    """Scheduler-side async fan-out to ranks 0..world_size−1
    (reference broadcast_*, tp_ipc_util.py:173-246: async fan-out measured
    fastest of seq/thread/async).  Errors aggregate per rank and raise."""

    def __init__(self, ipc_name: str, world_size: int | None = None,
                 pp_rank: int = 0, connect_timeout: float = 5.0,
                 endpoints: Sequence[str] | None = None):
        """``endpoints`` (multi-host): one per rank, each either a unix
        socket path or ``host:port``; overrides discovery by IPC name.
        Without it, rank endpoints resolve to ``w{rank}.sock`` if present,
        else the published ``w{rank}.addr`` (TCP listener on this or a
        filesystem-sharing host)."""
        if world_size is None:
            if endpoints is None:
                raise ValueError("need world_size or endpoints")
            world_size = len(endpoints)
        if endpoints is not None and len(endpoints) != world_size:
            raise ValueError(
                f"{len(endpoints)} endpoints for world_size={world_size}"
            )
        self.ipc_name = ipc_name
        self.world_size = world_size
        self.pp_rank = pp_rank
        self.connect_timeout = connect_timeout
        self._endpoints = list(endpoints) if endpoints is not None else None
        self._loop = asyncio.new_event_loop()
        self._loop_thread = threading.Thread(
            target=self._loop.run_forever, name="kvc-bcast-loop", daemon=True
        )
        self._loop_thread.start()
        self._conns: dict[int, tuple[asyncio.StreamReader, asyncio.StreamWriter]] = {}

    def _endpoint(self, rank: int) -> str:
        if self._endpoints is not None:
            return self._endpoints[rank]
        path = socket_path(self.ipc_name, rank, self.pp_rank)
        if os.path.exists(path):
            return path
        addr = address_path(self.ipc_name, rank, self.pp_rank)
        if os.path.exists(addr):
            with open(addr) as f:
                return f.read().strip()
        return path  # report the canonical path in the connect error

    async def _conn(self, rank: int):
        if rank not in self._conns:
            ep = self._endpoint(rank)
            if "/" not in ep and ":" in ep:
                host, port = ep.rsplit(":", 1)
                reader, writer = await asyncio.open_connection(
                    host, int(port)
                )
                sock = writer.get_extra_info("socket")
                if sock is not None:
                    sock.setsockopt(
                        socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
                    )
            else:
                reader, writer = await asyncio.open_unix_connection(ep)
            self._conns[rank] = (reader, writer)
        return self._conns[rank]

    async def _send_one(self, rank: int, payload: bytes) -> None:
        reader, writer = await self._conn(rank)
        writer.write(payload)
        await writer.drain()
        ack = await reader.readexactly(_ACK.size)
        ok, _ = _ACK.unpack(ack)
        if not ok:
            raise RuntimeError(f"rank {rank} rejected page-table update")

    async def _fan_out(self, payload: bytes) -> None:
        results = await asyncio.gather(
            *(self._send_one(r, payload) for r in range(self.world_size)),
            return_exceptions=True,
        )
        errors = {
            r: e for r, e in enumerate(results) if isinstance(e, Exception)
        }
        if errors:
            self._conns.clear()
            raise RuntimeError(f"page-table broadcast failed on ranks {errors}")

    def _run(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self._loop).result(
            timeout=self.connect_timeout + 10
        )

    # -- public sync API (callable from allocator hooks) ---------------------

    def broadcast_map(self, vpages: Sequence[int], ppages: Sequence[int]) -> None:
        payload = _HDR.pack(OP_MAP, len(vpages)) + np.asarray(
            [vpages, ppages], np.int32
        ).tobytes()
        self._run(self._fan_out(payload))

    def broadcast_unmap(self, vpages: Sequence[int], ppages: Sequence[int]) -> None:
        payload = _HDR.pack(OP_UNMAP, len(vpages)) + np.asarray(
            [vpages, ppages], np.int32
        ).tobytes()
        self._run(self._fan_out(payload))

    def wait_all_ready(self, timeout: float = 10.0) -> bool:
        """Poll every rank until all report ready (the analogue of
        broadcast_kv_tensors_created, consumed by KVCacheManager._post_init)."""
        import time

        payload = _HDR.pack(OP_QUERY_READY, 0)

        async def _query(rank: int) -> bool:
            reader, writer = await self._conn(rank)
            writer.write(payload)
            await writer.drain()
            ack = await reader.readexactly(_ACK.size)
            ok, _ = _ACK.unpack(ack)
            return bool(ok)

        async def _query_all():
            # gather must be created on the broadcast loop, not the caller's
            # thread (it binds to the current event loop at creation)
            return await asyncio.gather(
                *(_query(r) for r in range(self.world_size))
            )

        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if all(self._run(_query_all())):
                    return True
            except Exception:
                self._conns.clear()
            time.sleep(0.1)
        return False

    def close(self) -> None:
        async def _close_all():
            for _, writer in self._conns.values():
                writer.close()
            self._conns.clear()

        try:
            self._run(_close_all())
        except Exception:
            pass
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._loop_thread.join(timeout=2)
