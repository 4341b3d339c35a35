"""St9: lifecycle notifications (wdq0.pl:123-140, wdq0b.pl:148-156).

The reference announces job lifecycle events ("<cmd> started",
"<cmd> finished", "starting wdq0 loop") to a fanout pub/sub channel and
prints ``NOTIFY: [msg]``.  The Spark-first equivalent is a pluggable sink
invoked from the driver at pipeline lifecycle points: run start, stage
start, stage commit, graceful stop, run finish.  The default sink prints
the reference's ``NOTIFY: [msg]`` line; ``file_sink`` appends one
timestamped line per event for machine consumption; any callable works
(webhook, queue, SNS — driver-side only, never inside a task: executors
must stay side-effect-free so task retries cannot double-announce).
"""

from __future__ import annotations

import time
from collections.abc import Callable


def print_sink(msg: str) -> None:
    """wdq0.pl:127 shape."""
    print(f"NOTIFY: [{msg}]", flush=True)


def file_sink(path: str) -> Callable[[str], None]:
    """Append one ``<epoch>\\t<msg>`` line per event (the durable,
    tail-able stand-in for the reference's fanout channel)."""

    def sink(msg: str) -> None:
        with open(path, "a") as f:
            f.write(f"{time.time():.3f}\t{msg}\n")

    return sink


class Notifier:
    """Announce to a named channel through a sink.  Never raises: a dead
    notification endpoint must not fail the pipeline (the reference's
    fanout announce is likewise fire-and-forget)."""

    def __init__(self, sink: Callable[[str], None] | None = None, channel: str = "wdq"):
        self.sink = sink or print_sink
        self.channel = channel

    def __call__(self, msg: str) -> None:
        try:
            self.sink(f"{self.channel}: {msg}")
        except Exception:
            pass
