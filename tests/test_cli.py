"""CLI tests: kvctl against live shm segments (the operator surface)."""

import uuid

import pytest

from kvcached_tpu import shm
from kvcached_tpu.cli.kvctl import fmt_size, main, parse_size


@pytest.fixture
def seg():
    name = f"kvcached_cli_{uuid.uuid4().hex[:8]}"
    shm.init_kv_cache_limit(name, 8 << 30)
    shm.update_memory_usage(name, 2 << 30, 64 << 20)
    yield name
    shm.delete_kv_cache_segment(name)


class TestParseSize:
    def test_units(self):
        assert parse_size("10G") == 10 << 30
        assert parse_size("512M") == 512 << 20
        assert parse_size("1.5G") == int(1.5 * (1 << 30))
        assert parse_size("4096K") == 4096 << 10
        assert parse_size("123") == 123
        assert parse_size("2TB") == 2 << 40

    def test_invalid(self):
        with pytest.raises(SystemExit):
            parse_size("abc")

    def test_fmt_roundtrip(self):
        assert fmt_size(10 << 30) == "10.00G"
        assert fmt_size(123) == "123B"


class TestKvctl:
    def test_list_shows_segment(self, seg, capsys):
        assert main(["list"]) == 0
        out = capsys.readouterr().out
        assert seg in out and "8.00G" in out and "2.00G" in out

    def test_limit_updates_shm(self, seg, capsys):
        assert main(["limit", seg, "4G"]) == 0
        info = shm.get_kv_cache_info(seg)
        assert info.total_size == 4 << 30
        assert info.used_size == 2 << 30  # usage preserved

    def test_limit_prefix_resolution(self, seg):
        prefix = seg[:20]
        assert main(["limit", prefix, "1G"]) == 0
        assert shm.get_kv_cache_info(seg).total_size == 1 << 30

    def test_limit_unknown_segment_fails(self):
        with pytest.raises(SystemExit):
            main(["limit", "kvcached_nonexistent_xyz", "1G"])

    def test_delete(self, seg, capsys):
        assert main(["delete", seg]) == 0
        assert shm.get_kv_cache_info(seg) is None


class TestWatch:
    def test_watch_renders_then_exits_on_interrupt(self, seg, capsys, monkeypatch):
        """watch loops list+sleep; one frame then ^C must exit rc 0."""
        import kvcached_tpu.cli.kvctl as kvctl

        def fake_sleep(_):
            raise KeyboardInterrupt

        monkeypatch.setattr(kvctl.time, "sleep", fake_sleep)
        assert main(["watch", "--interval", "0.01"]) == 0
        out = capsys.readouterr().out
        assert seg in out


class TestLimitPercent:
    def test_limit_percent_of_device_hbm(self, seg, capsys, monkeypatch):
        import kvcached_tpu.cli.kvctl as kvctl

        monkeypatch.setattr(kvctl, "device_hbm_total", lambda: 16 << 30)
        assert main(["limit-percent", seg, "25"]) == 0
        info = shm.get_kv_cache_info(seg)
        assert info.total_size == 4 << 30
        assert "25" in capsys.readouterr().out

    def test_limit_percent_without_accelerator_fails(self, seg, monkeypatch):
        import kvcached_tpu.cli.kvctl as kvctl

        monkeypatch.setattr(kvctl, "device_hbm_total", lambda: None)
        with pytest.raises(SystemExit, match="HBM"):
            main(["limit-percent", seg, "50"])


class TestShell:
    def test_shell_executes_commands(self, seg, capsys, monkeypatch):
        lines = iter(["list", f"limit {seg} 1G", "", "quit"])
        monkeypatch.setattr("builtins.input", lambda *_: next(lines))
        assert main(["shell"]) == 0
        out = capsys.readouterr().out
        assert seg in out
        assert shm.get_kv_cache_info(seg).total_size == 1 << 30

    def test_shell_survives_bad_command(self, seg, capsys, monkeypatch):
        lines = iter(["limit nonexistent_xyz 1G", "quit"])
        monkeypatch.setattr("builtins.input", lambda *_: next(lines))
        assert main(["shell"]) == 0  # error printed, shell continues
        assert "error" in capsys.readouterr().out

    def test_shell_exits_on_eof(self, seg, monkeypatch):
        def raise_eof(*_):
            raise EOFError

        monkeypatch.setattr("builtins.input", raise_eof)
        assert main(["shell"]) == 0
