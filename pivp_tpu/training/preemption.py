"""Graceful-preemption support for the training loop.

TPU VMs and pod slices receive SIGTERM on maintenance events and
spot/preemptible reclaims. The training driver installs a handler that
only SETS A FLAG; the loop checks it at every dispatch boundary, writes
a full checkpoint (npz + orbax when configured), and returns cleanly —
so `--checkpointer orbax` auto-resume continues from the exact
optimizer step on the next launch. No reference equivalent (the
reference loses everything since its last epoch-interval save,
/root/reference/src/models/train_model.py:1023-1041).

Multi-host: the LOCAL flag is process-local, but the training loop acts
on the collective OR of it across processes (multihost.agree_flag at
every dispatch boundary) — a SIGTERM delivered to ANY single worker
checkpoints the whole cluster together, so the collective orbax save
barrier is always reached by every process
(tests/test_multihost_procs.py signals one worker and asserts both
exit cleanly with the checkpoint written).

The handler can only be installed from the main thread (a CPython
restriction); elsewhere `install` is a no-op and tests drive the flag
directly via `request`.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Callable, Iterable

logger = logging.getLogger(__name__)

_EVENT = threading.Event()

DEFAULT_SIGNALS = (signal.SIGTERM, signal.SIGINT)


def request() -> None:
    """Ask the running training loop to checkpoint and exit at the next
    dispatch boundary (what the signal handler does)."""
    _EVENT.set()


def requested() -> bool:
    return _EVENT.is_set()


def clear() -> None:
    _EVENT.clear()


def install(signals: Iterable[int] = DEFAULT_SIGNALS
            ) -> Callable[[], None]:
    """Install set-the-flag handlers; returns a restore() that reinstates
    the previous handlers. No-op (returns a no-op restore) off the main
    thread."""
    if threading.current_thread() is not threading.main_thread():
        return lambda: None

    # A stale flag from a previous preempted run in the same process
    # (sweep drivers, notebooks) would otherwise stop the new run after
    # one dispatch. Clearing here is safe: before install, these signals
    # would have killed the process anyway.
    _EVENT.clear()

    previous = {}

    def handler(signum, frame):
        del frame
        logger.warning(
            "Received signal %d — will checkpoint and exit at the next "
            "dispatch boundary", signum)
        _EVENT.set()

    for sig in signals:
        previous[sig] = signal.signal(sig, handler)

    def restore() -> None:
        for sig, prev in previous.items():
            signal.signal(sig, prev)

    return restore
