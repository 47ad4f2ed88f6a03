"""kvtop — live curses view of KV memory per engine instance.

Functional equivalent of the reference's ``kvcached/cli/kvtop.py`` (267 LoC):
auto-detects control-plane segments in /dev/shm by exact size, renders a
used/prealloc/free bar per engine plus a whole-device HBM bar (via JAX
``memory_stats``, the ``torch.cuda.mem_get_info`` stand-in).
"""

from __future__ import annotations

import curses
import time

from .. import shm
from .kvctl import fmt_size


def _device_stats():
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_in_use"]), int(stats["bytes_limit"])
    except Exception:
        pass
    return None


def _bar(width: int, fracs: list[tuple[float, int]]) -> list[tuple[str, int]]:
    """Build bar segments [(text, attr)]; fracs = [(fraction, color_pair)]."""
    out = []
    used = 0
    for frac, color in fracs:
        n = int(frac * width)
        n = min(n, width - used)
        if n > 0:
            out.append(("█" * n, color))
            used += n
    if used < width:
        out.append(("░" * (width - used), 0))
    return out


def gather(remotes=()) -> list[tuple[str, "shm.MemInfo"]]:
    """All visible segments: local first, then each remote host's
    (prefixed ``host:port/name``).  An unreachable remote renders as one
    error row instead of killing the monitor."""
    rows = []
    for name in shm.list_segments():
        info = shm.get_kv_cache_info(name)
        if info is not None and info.total_size > 0:
            rows.append((name, info))
    for client in remotes:
        try:
            for name in client.list_segments():
                info = client.get_kv_cache_info(name)
                if info is not None and info.total_size > 0:
                    rows.append((f"{client.addr.split('//')[-1]}/{name}", info))
        except Exception as e:  # noqa: BLE001 — keep the monitor alive
            rows.append((f"{client.addr.split('//')[-1]} UNREACHABLE "
                         f"({type(e).__name__})", shm.MemInfo()))
    return rows


def draw(stdscr, paused: bool, remotes=()) -> None:
    stdscr.erase()
    h, w = stdscr.getmaxyx()
    bar_w = max(20, w - 45)
    row = 0

    def put(y, x, text, attr=0):
        if 0 <= y < h:
            stdscr.addnstr(y, x, text, max(0, w - x - 1), attr)

    put(row, 0, "kvtop — elastic KV cache monitor (q quits, space pauses)",
        curses.A_BOLD)
    row += 2

    dev = _device_stats()
    if dev:
        in_use, limit = dev
        put(row, 0, f"{'DEVICE HBM':<28}")
        x = 29
        for text, attr in _bar(bar_w, [(in_use / limit, 1)]):
            put(row, x, text, curses.color_pair(attr) if attr else 0)
            x += len(text)
        put(row, x + 1, f"{fmt_size(in_use)}/{fmt_size(limit)}")
        row += 2

    rows = gather(remotes)
    if not rows:
        put(row, 0, "no kvcached engines running")
    for name, info in rows:
        if info.total_size <= 0:
            put(row, 0, name[: w - 1], curses.A_DIM)
            row += 1
            continue
        used_f = info.used_size / info.total_size
        pre_f = info.prealloc_size / info.total_size
        put(row, 0, f"{name[:27]:<28}")
        x = 29
        for text, attr in _bar(bar_w, [(used_f, 2), (pre_f, 3)]):
            put(row, x, text, curses.color_pair(attr) if attr else 0)
            x += len(text)
        put(row, x + 1,
            f"{fmt_size(info.used_size)}+{fmt_size(info.prealloc_size)}"
            f"/{fmt_size(info.total_size)}")
        row += 1
    if paused:
        put(h - 1, 0, "[paused]", curses.A_REVERSE)
    stdscr.refresh()


def _loop(stdscr, remotes=()) -> int:
    curses.curs_set(0)
    curses.use_default_colors()
    curses.init_pair(1, curses.COLOR_CYAN, -1)
    curses.init_pair(2, curses.COLOR_GREEN, -1)
    curses.init_pair(3, curses.COLOR_YELLOW, -1)
    stdscr.nodelay(True)
    paused = False
    while True:
        if not paused:
            draw(stdscr, paused, remotes)
        ch = stdscr.getch()
        if ch in (ord("q"), ord("Q")):
            return 0
        if ch == ord(" "):
            paused = not paused
            draw(stdscr, paused, remotes)
        time.sleep(0.5)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="kvtop", description=__doc__)
    p.add_argument(
        "--remote", action="append", default=[], metavar="HOST:PORT",
        help="also monitor another host's segments (repeatable)",
    )
    args = p.parse_args(argv)
    remotes = []
    if args.remote:
        from ..controller.shm_http import RemoteShm

        remotes = [RemoteShm(a) for a in args.remote]
    return curses.wrapper(lambda scr: _loop(scr, tuple(remotes)))


if __name__ == "__main__":
    raise SystemExit(main())
