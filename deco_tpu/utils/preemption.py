"""Graceful preemption for training loops (SURVEY §5: the reference has no
failure detection / elastic recovery — torchelastic absent, the on-exception
checkpoint hook commented out upstream, model_checkpoint.py:21-23).

TPU preemption (and most cluster schedulers) delivers SIGTERM with a grace
window. Python's default disposition kills the process without unwinding, so
the train loops' on-exception checkpoint never runs. ``PreemptionGuard``
converts the first SIGTERM into a cooperative stop flag the fit loops check
once per step — the loop breaks, the normal end-of-fit ``maybe_save(force=
True)`` writes a resumable checkpoint, and the process exits cleanly. A
second SIGTERM restores the default disposition (immediate termination) so a
hung save cannot block the scheduler.
"""

from __future__ import annotations

import signal
import sys


class PreemptionGuard:
    """Context manager: first SIGTERM -> ``requested`` flag; second -> die.

    Only installs a handler in the main thread (signal module requirement);
    elsewhere it degrades to a no-op guard with ``requested`` always False.
    """

    def __init__(self):
        self.requested = False
        self._prev = None
        self._installed = False

    def _handler(self, signum, frame):
        if self.requested:  # second signal: give up immediately
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            signal.raise_signal(signal.SIGTERM)
        self.requested = True
        print("PreemptionGuard: SIGTERM received — finishing the current "
              "step, checkpointing, and exiting (send again to force-kill)",
              file=sys.stderr, flush=True)

    def __enter__(self):
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handler)
            self._installed = True
        except ValueError:  # not the main thread
            pass
        return self

    def __exit__(self, *exc):
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
        return False
