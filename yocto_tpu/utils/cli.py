"""CLI utilities: timers and printing, the yocto_cli.h equivalents."""

from __future__ import annotations

import sys
import time


class SimpleTimer:
    """Scoped wall-clock timer printing `name: HH:MM:SS.mmm` like the
    reference's simple_timer/print_info pattern (yocto_cli.h:128-162)."""

    def __init__(self, name: str = "", autoprint: bool = True):
        self.name = name
        self.autoprint = autoprint
        self.start = time.monotonic()

    def elapsed(self) -> float:
        return time.monotonic() - self.start

    @staticmethod
    def format(seconds: float) -> str:
        msec = int(seconds * 1000)
        sec, msec = divmod(msec, 1000)
        mn, sec = divmod(sec, 60)
        hr, mn = divmod(mn, 60)
        return f"{hr:02d}:{mn:02d}:{sec:02d}.{msec:03d}"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.autoprint and exc[0] is None:
            print_info(f"{self.name}: {self.format(self.elapsed())}")


def print_info(msg: str) -> None:
    print(msg)


def print_error(msg: str) -> None:
    print(f"error: {msg}", file=sys.stderr)


def exit_error(msg: str) -> "None":
    print_error(msg)
    sys.exit(1)
