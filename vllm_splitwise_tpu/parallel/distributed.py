"""Multi-host runtime: process groups, rendezvous, and the control plane.

Role parity with the reference's multi-node layer — Ray placement groups
plus MSCCL++ bootstrap (vllm/executor/ray_gpu_executor.py:87-232,
vllm/worker/comm_utils.py:150-223) — rebuilt on JAX's native pieces:

* ``jax.distributed`` gives every process the GLOBAL device view and a
  coordination KV store (used here for service rendezvous, the role Ray's
  object store plays in the reference).
* Cross-host device-to-device KV movement rides JAX's DCN socket
  transfer (``jax_cross_host_transfer_socket_address``); see
  worker/cross_host_migration.py.
* Host-side work dispatch (prefill jobs, sampled tokens) uses a tiny
  length-prefixed pickle channel over TCP — the role of Ray RPC.  The
  channel trusts its peers, exactly like the reference's Ray cluster.

Process layout convention for disaggregated serving: processes
``[0, num_prefill_processes)`` form the prefill pool, the rest the
decode pool.  Process ``num_prefill_processes`` (the first decode
process) runs the engine front end.
"""
from __future__ import annotations

import os
import pickle
import socket
import struct
import threading
from dataclasses import dataclass
from typing import List, Optional

import jax

from vllm_splitwise_tpu.logger import init_logger

logger = init_logger(__name__)

_INITIALIZED = False


@dataclass
class HostRole:
    """This process's place in the multi-host layout."""
    process_id: int
    num_processes: int
    num_prefill_processes: int

    @property
    def is_prefill(self) -> bool:
        return self.process_id < self.num_prefill_processes

    @property
    def is_engine(self) -> bool:
        """The engine front end lives on the first decode process."""
        return self.process_id == self.num_prefill_processes


def init_distributed(coordinator_address: str,
                     num_processes: int,
                     process_id: int,
                     cross_host_transfer_address: Optional[str] = None,
                     platform: Optional[str] = None) -> None:
    """Join the multi-process JAX cluster.

    Must run before any JAX backend touch.  ``cross_host_transfer_address``
    enables device-to-device ``jax.device_put`` across hosts (the DCN KV
    path); each process needs a distinct host:port it can be reached at.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if platform:
        # This must beat any sitecustomize that pinned another backend.
        jax.config.update("jax_platforms", platform)
    if cross_host_transfer_address:
        jax.config.update("jax_cross_host_transfer_socket_address",
                          cross_host_transfer_address)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    logger.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        process_id, num_processes, len(jax.local_devices()),
        len(jax.devices()))


def is_distributed() -> bool:
    return _INITIALIZED or jax.process_count() > 1


def _kv_client():
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is None:
        raise RuntimeError("jax.distributed is not initialized")
    return client


def publish(key: str, value: str) -> None:
    """Announce a value cluster-wide (coordination KV store)."""
    _kv_client().key_value_set(key, value)


def lookup(key: str, timeout_ms: int = 120_000) -> str:
    """Block until some process publishes ``key``."""
    return _kv_client().blocking_key_value_get(key, timeout_ms)


def devices_of_processes(process_ids: List[int]) -> List[jax.Device]:
    """Global devices owned by the given processes, in stable order."""
    wanted = set(process_ids)
    return [d for d in jax.devices() if d.process_index in wanted]


# ---------------------------------------------------------------------------
# Control channel: length-prefixed pickle over TCP.
# ---------------------------------------------------------------------------

_LEN = struct.Struct("<Q")


class ControlChannel:
    """One bidirectional message pipe between two cooperating hosts.

    Messages are pickled Python objects — the channel is a control plane
    between mutually trusted processes of one serving deployment (the
    same trust model as the reference's Ray RPC).  Not for bulk data:
    KV pages ride the DCN device transfer, not this socket.
    """

    def __init__(self, sock: socket.socket) -> None:
        self._sock = sock
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._send_lock = threading.Lock()

    # -- factories ----------------------------------------------------

    @classmethod
    def serve(cls, name: str, host: str = "0.0.0.0",
              advertise: Optional[str] = None,
              timeout: float = 300.0) -> "ControlChannel":
        """Listen, publish the address under ``name``, accept one peer."""
        listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        listener.bind((host, 0))
        listener.listen(1)
        port = listener.getsockname()[1]
        addr = advertise or f"{_reachable_host()}:{port}"
        publish(f"vst/channel/{name}", addr)
        listener.settimeout(timeout)
        conn, peer = listener.accept()
        listener.close()
        logger.info("control channel %r: peer %s connected", name, peer)
        return cls(conn)

    @classmethod
    def connect(cls, name: str, timeout: float = 300.0) -> "ControlChannel":
        """Resolve ``name`` via the cluster KV store and dial it."""
        addr = lookup(f"vst/channel/{name}", int(timeout * 1000))
        host, port = addr.rsplit(":", 1)
        sock = socket.create_connection((host, int(port)), timeout=timeout)
        sock.settimeout(None)
        logger.info("control channel %r: connected to %s", name, addr)
        return cls(sock)

    # -- messaging ----------------------------------------------------

    def send(self, obj) -> None:
        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        with self._send_lock:
            self._sock.sendall(_LEN.pack(len(payload)) + payload)

    def recv(self, timeout: Optional[float] = None):
        self._sock.settimeout(timeout)
        try:
            header = self._recv_exact(_LEN.size)
            return pickle.loads(self._recv_exact(_LEN.unpack(header)[0]))
        finally:
            self._sock.settimeout(None)

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            chunk = self._sock.recv(min(n, 1 << 20))
            if not chunk:
                raise ConnectionError("control channel peer closed")
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def close(self) -> None:
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()


def _reachable_host() -> str:
    """Best-effort address peers can dial (hostname IP, else loopback)."""
    host = os.environ.get("VST_HOST_ADDRESS")
    if host:
        return host
    try:
        return socket.gethostbyname(socket.gethostname())
    except OSError:
        return "127.0.0.1"
