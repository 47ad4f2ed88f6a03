"""Cross-host operator plane: kvctl/kvtop reach another HOST's shm
segments over TCP (SURVEY §2f: "shm control plane stays POSIX shm per
host + an aggregation layer for N≥2 hosts"; reference kvctl is
single-node, /root/reference/kvcached/cli/kvctl.py:420-477).

The "other host" is another PROCESS running the standalone shm agent
(`kvcached_tpu.controller.shm_http`) — same trust boundary as the
reference's two-process shm tests (tests/test_shm_tracker.py), with TCP
instead of a shared /dev/shm handle as the operator's path."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

from kvcached_tpu import shm

SEG = "kvcached_xhost_test"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


AGENT_SCRIPT = r"""
import sys
from kvcached_tpu import shm
from kvcached_tpu.controller.shm_http import main

seg, port = sys.argv[1], sys.argv[2]
# this process OWNS the segment (the engine-host role)
shm.init_kv_cache_limit(seg, 1 << 30)
shm.update_memory_usage(seg, 123 << 20, 5 << 20)
print("ready", flush=True)
main(["--host", "127.0.0.1", "--port", port])
"""


@pytest.fixture
def agent():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.Popen(
        [sys.executable, "-c", AGENT_SCRIPT, SEG, str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    try:
        assert proc.stdout.readline().strip() == "ready"
        deadline = time.time() + 30
        addr = f"127.0.0.1:{port}"
        while time.time() < deadline:
            try:
                urllib.request.urlopen(
                    f"http://{addr}/shm/segments", timeout=1)
                break
            except Exception:
                time.sleep(0.2)
        else:
            raise RuntimeError("agent never came up")
        yield addr
    finally:
        proc.terminate()
        proc.wait(timeout=10)
        shm.delete_kv_cache_segment(SEG)


class TestRemoteKvctl:
    def test_list_limits_and_deletes_over_tcp(self, agent, capsys):
        from kvcached_tpu.cli.kvctl import main as kvctl

        # list: the other process's segment is visible with its numbers
        assert kvctl(["--remote", agent, "list"]) == 0
        out = capsys.readouterr().out
        assert SEG in out and "1.00G" in out

        # limit over TCP: the OWNER's /dev/shm segment actually changes
        # (this test process shares the host, so it can observe directly
        # what the owner's resize watcher would read)
        assert kvctl(["--remote", agent, "limit", SEG, "256M"]) == 0
        info = shm.get_kv_cache_info(SEG)
        assert info is not None and info.total_size == 256 << 20

        # prefix resolution works remotely too
        assert kvctl(["--remote", agent, "limit", SEG[:12], "512M"]) == 0
        assert shm.get_kv_cache_info(SEG).total_size == 512 << 20

        # usage written by the owner is visible through the remote path
        from kvcached_tpu.controller.shm_http import RemoteShm

        ri = RemoteShm(agent).get_kv_cache_info(SEG)
        assert ri.used_size == 123 << 20 and ri.prealloc_size == 5 << 20

        # delete over TCP removes the owner's segment
        assert kvctl(["--remote", agent, "delete", SEG]) == 0
        assert shm.get_kv_cache_info(SEG) is None

    def test_unknown_segment_404(self, agent):
        from kvcached_tpu.controller.shm_http import RemoteShm

        with pytest.raises(SystemExit, match="remote limit failed"):
            RemoteShm(agent).update_kv_cache_limit("kvcached_nope", 1 << 20)


class TestRemoteKvtop:
    def test_gather_merges_local_and_remote(self, agent):
        from kvcached_tpu.cli.kvtop import gather
        from kvcached_tpu.controller.shm_http import RemoteShm

        local_seg = "kvcached_xhost_local"
        shm.init_kv_cache_limit(local_seg, 2 << 30)
        try:
            rows = dict(gather([RemoteShm(agent)]))
            assert local_seg in rows
            assert f"{agent}/{SEG}" in rows
            assert rows[f"{agent}/{SEG}"].used_size == 123 << 20
        finally:
            shm.delete_kv_cache_segment(local_seg)

    def test_unreachable_remote_renders_error_row(self):
        from kvcached_tpu.cli.kvtop import gather
        from kvcached_tpu.controller.shm_http import RemoteShm

        rows = gather([RemoteShm("127.0.0.1:9", timeout=0.5)])
        assert any("UNREACHABLE" in name for name, _ in rows)
