"""Cross-host operator plane for the shm control channel.

The limit/usage channel is POSIX shm + flock, strictly per host
(`kvcached_tpu/shm.py`; reference `kvcached/cli/utils.py:54-96`).  The
reference is single-node so its CLI stops there
(`/root/reference/kvcached/cli/kvctl.py:420-477`); SURVEY §2f's TPU
translation calls for "an aggregation layer for N≥2 hosts" — with placed
pp stages and TCP mirrors, a pool's segment may live on a host the
operator is not logged into.

This module is that layer:

- ``add_shm_routes(app)`` mounts the surface on any aiohttp app — the
  multi-LLM frontend mounts it by default (`frontend.py`), and
  ``python -m kvcached_tpu.controller.shm_http --port N`` runs it
  standalone on hosts that only run engines (mirror/stage hosts).
- ``RemoteShm`` is the stdlib-only client the CLI uses
  (``kvctl --remote host:port``, ``kvtop --remote host:port``): the same
  list/limit/delete verbs, over TCP.  A remote ``limit`` writes the
  target host's shm segment; that host's engine applies it through the
  normal resize-watcher poll — the elasticity control loop
  (SURVEY §3.4) is unchanged, only the operator's reach extends.

Endpoints (JSON):
  GET    /shm/segments           → {"segments": [{name,total,used,prealloc}],
                                    "device": {in_use, limit} | null}
  POST   /shm/limit/{name}       body {"bytes": N} or {"percent": P}
  DELETE /shm/segments/{name}
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from .. import shm
from ..logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)


def _device_stats():
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return {"in_use": int(stats["bytes_in_use"]),
                    "limit": int(stats["bytes_limit"])}
    except Exception:
        pass
    return None


def _segment_rows() -> list[dict]:
    rows = []
    for name in shm.list_segments():
        info = shm.get_kv_cache_info(name)
        if info is None:
            continue
        rows.append({
            "name": name,
            "total": int(info.total_size),
            "used": int(info.used_size),
            "prealloc": int(info.prealloc_size),
        })
    return rows


def add_shm_routes(app) -> None:
    """Mount the operator surface on an aiohttp app."""
    from aiohttp import web

    async def segments(_request):
        return web.json_response(
            {"segments": _segment_rows(), "device": _device_stats()}
        )

    async def limit(request):
        name = request.match_info["name"]
        try:
            body = await request.json()
        except Exception:
            body = {}
        if name not in shm.list_segments():
            return web.json_response(
                {"error": f"no segment named {name!r}"}, status=404
            )
        if "bytes" in body:
            size = int(body["bytes"])
        elif "percent" in body:
            dev = _device_stats()
            if dev is None:
                return web.json_response(
                    {"error": "no accelerator on this host for percent"},
                    status=400,
                )
            size = int(dev["limit"] * float(body["percent"]) / 100.0)
        else:
            return web.json_response(
                {"error": "body needs 'bytes' or 'percent'"}, status=400
            )
        info = shm.update_kv_cache_limit(name, size)
        logger.info("remote limit: %s -> %d bytes", name, size)
        return web.json_response({
            "name": name, "total": int(info.total_size),
            "used": int(info.used_size),
            "prealloc": int(info.prealloc_size),
        })

    async def delete(request):
        name = request.match_info["name"]
        ok = shm.delete_kv_cache_segment(name)
        return web.json_response({"deleted": bool(ok)},
                                 status=200 if ok else 404)

    app.router.add_get("/shm/segments", segments)
    app.router.add_post("/shm/limit/{name}", limit)
    app.router.add_delete("/shm/segments/{name}", delete)


class RemoteShm:
    """stdlib-only client mirroring the local ``kvcached_tpu.shm`` verbs
    over the HTTP surface.  One GET caches the listing so kvctl's
    list/resolve flow stays one round-trip."""

    def __init__(self, addr: str, timeout: float = 5.0):
        self.addr = addr if "://" in addr else f"http://{addr}"
        self.timeout = timeout
        self._cache: dict[str, shm.MemInfo] = {}
        self.device: dict | None = None

    def _req(self, method: str, path: str, body: dict | None = None):
        req = urllib.request.Request(
            self.addr + path,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
            method=method,
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode())

    @staticmethod
    def _info(row: dict) -> shm.MemInfo:
        return shm.MemInfo(row["total"], row["used"], row["prealloc"])

    def refresh(self) -> None:
        data = self._req("GET", "/shm/segments")
        self._cache = {
            row["name"]: self._info(row) for row in data["segments"]
        }
        self.device = data.get("device")

    def list_segments(self) -> list[str]:
        self.refresh()
        return sorted(self._cache)

    def get_kv_cache_info(self, name: str) -> shm.MemInfo | None:
        if name not in self._cache:
            self.refresh()
        return self._cache.get(name)

    def update_kv_cache_limit(self, name: str, size: int) -> shm.MemInfo:
        try:
            row = self._req("POST", f"/shm/limit/{name}", {"bytes": int(size)})
        except urllib.error.HTTPError as e:
            raise SystemExit(
                f"remote limit failed: {e.read().decode()[:200]}"
            ) from e
        info = self._info(row)
        self._cache[name] = info
        return info

    def limit_percent(self, name: str, percent: float) -> shm.MemInfo:
        """Percent of the REMOTE host's accelerator HBM."""
        try:
            row = self._req(
                "POST", f"/shm/limit/{name}", {"percent": float(percent)}
            )
        except urllib.error.HTTPError as e:
            raise SystemExit(
                f"remote limit failed: {e.read().decode()[:200]}"
            ) from e
        info = self._info(row)
        self._cache[name] = info
        return info

    def delete_kv_cache_segment(self, name: str) -> bool:
        try:
            return bool(self._req(
                "DELETE", f"/shm/segments/{name}")["deleted"])
        except urllib.error.HTTPError:
            return False


def main(argv=None) -> int:
    """Standalone shm agent for engine-only hosts."""
    import argparse

    from aiohttp import web

    p = argparse.ArgumentParser(
        prog="kvcached-shm-agent", description=__doc__)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9810)
    args = p.parse_args(argv)
    app = web.Application()
    add_shm_routes(app)
    logger.info("shm agent serving on %s:%d", args.host, args.port)
    web.run_app(app, host=args.host, port=args.port, print=None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
