"""kvctl — operator control of per-engine KV memory limits.

Functional equivalent of the reference's ``kvcached/cli/kvctl.py`` (481 LoC):
subcommands ``list / limit / limit-percent / watch / kvtop / delete / shell``
operating on the /dev/shm control-plane segments.  An engine's resize
watcher picks up limit changes within ~100 ms and the allocator applies
them on the next alloc (grow immediately, shrink deferred until frees
catch up).

Usage:
    python -m kvcached_tpu.cli.kvctl list
    python -m kvcached_tpu.cli.kvctl limit <ipc_name> 10G
    python -m kvcached_tpu.cli.kvctl limit-percent <ipc_name> 40
    python -m kvcached_tpu.cli.kvctl watch [ipc_name]
    python -m kvcached_tpu.cli.kvctl delete <ipc_name>
    python -m kvcached_tpu.cli.kvctl shell
"""

from __future__ import annotations

import argparse
import sys
import time

from .. import shm


def parse_size(text: str) -> int:
    """Human size: 10G, 512M, 4096K, 123 (bytes), 1.5G."""
    text = text.strip().upper()
    mult = 1
    for suffix, m in (("TB", 1 << 40), ("T", 1 << 40), ("GB", 1 << 30),
                      ("G", 1 << 30), ("MB", 1 << 20), ("M", 1 << 20),
                      ("KB", 1 << 10), ("K", 1 << 10), ("B", 1)):
        if text.endswith(suffix):
            mult = m
            text = text[: -len(suffix)]
            break
    try:
        return int(float(text) * mult)
    except ValueError as e:
        raise SystemExit(f"invalid size: {text!r}") from e


def fmt_size(n: int) -> str:
    for unit, m in (("T", 1 << 40), ("G", 1 << 30), ("M", 1 << 20), ("K", 1 << 10)):
        if n >= m:
            return f"{n / m:.2f}{unit}"
    return f"{n}B"


def device_hbm_total() -> int | None:
    """Whole-accelerator memory for limit-percent (cudaMemGetInfo analogue)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        return int(stats["bytes_limit"]) if stats else None
    except Exception:
        return None


def _backend(args):
    """Local shm module, or a RemoteShm client when --remote is given —
    same verbs, so every subcommand works across hosts (SURVEY §2f's
    N≥2-hosts aggregation layer; reference kvctl is single-node)."""
    remote = getattr(args, "remote", None)
    if remote:
        from ..controller.shm_http import RemoteShm

        return RemoteShm(remote)
    return shm


def cmd_list(args) -> int:
    be = _backend(args)
    segs = be.list_segments()
    if not segs:
        print("no kvcached segments found")
        return 0
    print(f"{'IPC NAME':<40} {'LIMIT':>10} {'USED':>10} {'PREALLOC':>10} {'UTIL':>6}")
    for name in segs:
        info = be.get_kv_cache_info(name)
        if info is None:
            continue
        util = info.used_size / info.total_size if info.total_size else 0.0
        print(
            f"{name:<40} {fmt_size(info.total_size):>10} "
            f"{fmt_size(info.used_size):>10} {fmt_size(info.prealloc_size):>10} "
            f"{util:>5.0%}"
        )
    return 0


def _resolve(name: str, be=shm) -> str:
    segs = be.list_segments()
    if name in segs:
        return name
    matches = [s for s in segs if s.startswith(name)]
    if len(matches) == 1:
        return matches[0]
    if not matches:
        raise SystemExit(f"no segment named {name!r} (have: {', '.join(segs) or 'none'})")
    raise SystemExit(f"ambiguous name {name!r}: {', '.join(matches)}")


def cmd_limit(args) -> int:
    be = _backend(args)
    name = _resolve(args.ipc_name, be)
    size = parse_size(args.size)
    info = be.update_kv_cache_limit(name, size)
    print(f"{name}: limit set to {fmt_size(size)} (used {fmt_size(info.used_size)})")
    return 0


def cmd_limit_percent(args) -> int:
    be = _backend(args)
    name = _resolve(args.ipc_name, be)
    if be is not shm:
        # percent of the REMOTE host's accelerator — resolved there
        info = be.limit_percent(name, args.percent)
        print(f"{name}: limit set to {fmt_size(info.total_size)} "
              f"({args.percent}% of remote HBM)")
        return 0
    total = device_hbm_total()
    if total is None:
        raise SystemExit("cannot determine device HBM size (no accelerator?)")
    size = int(total * args.percent / 100.0)
    shm.update_kv_cache_limit(name, size)
    print(f"{name}: limit set to {fmt_size(size)} ({args.percent}% of {fmt_size(total)})")
    return 0


def cmd_watch(args) -> int:
    try:
        while True:
            print("\x1b[2J\x1b[H", end="")
            cmd_list(args)
            time.sleep(args.interval)
    except KeyboardInterrupt:
        return 0


def cmd_delete(args) -> int:
    be = _backend(args)
    name = _resolve(args.ipc_name, be)
    ok = be.delete_kv_cache_segment(name)
    print(f"{name}: {'deleted' if ok else 'not found'}")
    return 0 if ok else 1


def cmd_kvtop(_args) -> int:
    from .kvtop import main as kvtop_main

    return kvtop_main()


def cmd_shell(_args) -> int:
    """Interactive shell with segment-name completion."""
    try:
        import readline

        def complete(text, state):
            options = [s for s in shm.list_segments() if s.startswith(text)]
            options += [c for c in ("list", "limit", "limit-percent", "watch",
                                    "delete", "quit") if c.startswith(text)]
            return options[state] if state < len(options) else None

        readline.set_completer(complete)
        readline.parse_and_bind("tab: complete")
    except ImportError:
        pass
    print("kvctl shell — commands: list | limit <name> <size> | "
          "limit-percent <name> <pct> | delete <name> | quit")
    while True:
        try:
            line = input("kvctl> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line in ("quit", "exit", "q"):
            return 0
        try:
            main(line.split())
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"error: {e}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kvctl", description=__doc__)
    p.add_argument(
        "--remote", metavar="HOST:PORT", default=None,
        help="operate on another host's segments via its shm HTTP surface "
             "(the frontend, or `python -m kvcached_tpu.controller.shm_http`)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list").set_defaults(fn=cmd_list)
    sp = sub.add_parser("limit")
    sp.add_argument("ipc_name")
    sp.add_argument("size")
    sp.set_defaults(fn=cmd_limit)
    sp = sub.add_parser("limit-percent")
    sp.add_argument("ipc_name")
    sp.add_argument("percent", type=float)
    sp.set_defaults(fn=cmd_limit_percent)
    sp = sub.add_parser("watch")
    sp.add_argument("ipc_name", nargs="?")
    sp.add_argument("--interval", type=float, default=1.0)
    sp.set_defaults(fn=cmd_watch)
    sp = sub.add_parser("delete")
    sp.add_argument("ipc_name")
    sp.set_defaults(fn=cmd_delete)
    sub.add_parser("kvtop").set_defaults(fn=cmd_kvtop)
    sub.add_parser("shell").set_defaults(fn=cmd_shell)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
