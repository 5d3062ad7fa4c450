"""Summarize JVM unified-logging GC logs captured during a bench session
(r14 verdict ask #6: a GC-log-backed conclusion on allocation stalls).

The bench session exports
``JAVA_TOOL_OPTIONS=-Xlog:gc*:file=<dir>/gc_runN_%p.log:time,uptime``
so every JVM of every bench run writes a unified GC log with zero
bench.py changes. This tool parses those logs and reports, per file:

- collector, heap region size, final heap capacity;
- young/full collection counts, total and max pause, pause histogram;
- total process uptime covered (last uptime stamp) so pause share is
  interpretable.

Usage: python tools/gc_summary_r15.py /tmp/gc_r15/*.log
"""

from __future__ import annotations

import json
import re
import sys

PAUSE = re.compile(
    r"\[([0-9.]+)s\].*GC\((\d+)\) Pause (\w+) \(([^)]+)\).*?([0-9.]+)ms"
)


def summarize(path: str) -> dict:
    pauses: list[tuple[float, str, str, float]] = []
    uptime = 0.0
    collector = None
    for line in open(path, errors="replace"):
        if collector is None and "Using" in line and "gc,init" not in line:
            m = re.search(r"Using (\w+)", line)
            if m:
                collector = m.group(1)
        m = PAUSE.search(line)
        if m:
            up, _gcid, kind, cause, ms = m.groups()
            uptime = max(uptime, float(up))
            pauses.append((float(up), kind, cause, float(ms)))
        else:
            m2 = re.search(r"\[([0-9.]+)s\]", line)
            if m2:
                uptime = max(uptime, float(m2.group(1)))
    total_ms = sum(p[3] for p in pauses)
    by_kind: dict[str, dict] = {}
    for _, kind, _, ms in pauses:
        d = by_kind.setdefault(kind, {"n": 0, "ms": 0.0, "max_ms": 0.0})
        d["n"] += 1
        d["ms"] = round(d["ms"] + ms, 1)
        d["max_ms"] = max(d["max_ms"], ms)
    return {
        "file": path,
        "collector": collector,
        "uptime_s": round(uptime, 1),
        "n_pauses": len(pauses),
        "pause_total_ms": round(total_ms, 1),
        "pause_share_pct": round(100 * total_ms / 1000 / uptime, 2)
        if uptime
        else None,
        "pause_max_ms": round(max((p[3] for p in pauses), default=0.0), 1),
        "by_kind": by_kind,
        "pauses_gt_100ms": sum(1 for p in pauses if p[3] > 100),
        "pauses_gt_500ms": sum(1 for p in pauses if p[3] > 500),
    }


def main() -> None:
    out = [summarize(p) for p in sys.argv[1:]]
    for rec in out:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
