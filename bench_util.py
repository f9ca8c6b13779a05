"""Shared /proc CPU accounting for the bench harnesses.

The box is multi-tenant: wall-clock numbers are only interpretable next
to evidence of what ELSE was running.  These helpers measure, over a
window, (a) total system busy CPU (from /proc/stat) and (b) the CPU of
one process subtree (the bench itself: python driver + Spark JVM +
Python workers, from /proc/<pid>/stat, short-lived workers retained via
last-seen totals).  neighbor = total - own.  Used by bench_quiet.py's
paired scaling protocol (where it gates clean windows) and by bench.py
itself (VERDICT r3 item 8: the driver's own artifact carries the
contamination evidence).
"""

from __future__ import annotations

import os
import threading
import time

TICKS = os.sysconf("SC_CLK_TCK")


def system_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return sum(vals) - idle


def proc_table() -> dict[int, tuple[int, int]]:
    """pid -> (ppid, utime+stime jiffies) for all live processes."""
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: fields resume after the LAST ')'
        rest = s[s.rindex(")") + 2:].split()
        # rest[1] = ppid (field 4), rest[11]/rest[12] = utime/stime
        out[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
    return out


def subtree_jiffies(root_pid: int, table, last_seen: dict[int, int]) -> None:
    """Update last_seen with the cumulative jiffies of every process in
    root_pid's subtree (vanished pids keep their last-seen total, so
    short-lived workers still count toward 'our' CPU)."""
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _j) in table.items():
        kids.setdefault(ppid, []).append(pid)
    stack = [root_pid]
    while stack:
        p = stack.pop()
        if p in table:
            j = table[p][1]
            if j >= last_seen.get(p, 0):
                last_seen[p] = j
            stack.extend(kids.get(p, []))


class NeighborSampler:
    """Measure own-subtree vs neighbor CPU over a window.

    Usage::

        ns = NeighborSampler()          # defaults to this process
        ns.start()
        ... timed work ...
        ev = ns.stop()  # {"own_cores_avg": .., "neighbor_cores_avg": ..}
    """

    def __init__(self, root_pid: int | None = None, interval_s: float = 0.5):
        self.root_pid = root_pid or os.getpid()
        self.interval_s = interval_s
        self._own: dict[int, int] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._sys0 = 0
        self._own0 = 0
        self._t0 = 0.0

    def _sample(self) -> None:
        while not self._stop.is_set():
            try:
                subtree_jiffies(self.root_pid, proc_table(), self._own)
            except Exception:
                pass
            self._stop.wait(self.interval_s)

    def start(self) -> None:
        subtree_jiffies(self.root_pid, proc_table(), self._own)
        self._own0 = sum(self._own.values())
        self._sys0 = system_busy_jiffies()
        self._t0 = time.time()
        self._stop.clear()
        self._thread = threading.Thread(target=self._sample, daemon=True)
        self._thread.start()

    def stop(self) -> dict:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        try:
            subtree_jiffies(self.root_pid, proc_table(), self._own)
        except Exception:
            pass
        wall = max(time.time() - self._t0, 1e-9)
        busy = (system_busy_jiffies() - self._sys0) / TICKS
        mine = (sum(self._own.values()) - self._own0) / TICKS
        return {
            "wall_s": round(wall, 1),
            "own_cores_avg": round(mine / wall, 2),
            "neighbor_cores_avg": round(max(busy - mine, 0.0) / wall, 2),
        }
