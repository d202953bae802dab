"""Lightweight monitoring utilities.

Parity with `inferix/core/monitoring/timer.py:6-61` (EventPathTimer —
barrier-free synced timestamps for cross-host event ordering) and the
rank-0 printing helpers of `inferix/distributed/dist_utils.py:26-47`."""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax


class EventPathTimer:
    """Records named wall-clock timestamps without device synchronization;
    `synced_record` also stamps the process index so multi-host traces can be
    aligned."""

    def __init__(self):
        self.events: List[Tuple[str, float, int]] = []
        self._t0 = time.monotonic()

    def record(self, name: str) -> None:
        self.events.append((name, time.monotonic() - self._t0, -1))

    def synced_record(self, name: str) -> None:
        self.events.append(
            (name, time.monotonic() - self._t0, jax.process_index())
        )

    def spans(self) -> Dict[str, float]:
        """Durations between consecutive events."""
        out = {}
        for (a, ta, _), (b, tb, _) in zip(self.events, self.events[1:]):
            out[f"{a}->{b}"] = tb - ta
        return out

    def reset(self) -> None:
        self.events.clear()
        self._t0 = time.monotonic()


_timer: Optional[EventPathTimer] = None


def event_path_timer() -> EventPathTimer:
    global _timer
    if _timer is None:
        _timer = EventPathTimer()
    return _timer


def print_rank_0(*args, **kwargs) -> None:
    if jax.process_index() == 0:
        print(*args, **kwargs)


def print_per_rank(*args, **kwargs) -> None:
    print(f"[host {jax.process_index()}/{jax.process_count()}]",
          *args, **kwargs)
