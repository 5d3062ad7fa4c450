"""Round-open checklist as one command (codifies the r13+ ritual).

Since r13 the driver window is a staleness rotation
(tools/certification.py:rotation_window), and tests/test_catalog_window.py
goes red at round open the moment the driver commits the previous round's
CORRECTNESS artifact — WINDOW_ROUND must then be bumped and the literal
list in sparkstreamingrealtimedatawithkafka_spark/plans/__init__.py regenerated. The steps are
mechanical but precise; this tool computes all of them and prints a
ready-to-paste block, so round open is a read-check-paste instead of
archaeology. It NEVER edits anything itself.

Usage:  python tools/round_open.py

Reports, in order:
1. newest git-tracked CORRECTNESS round vs the package's WINDOW_ROUND —
   whether a rotation is due;
2. driver artifacts present on disk but not git-tracked (the recurring
   by-design boundary: the driver writes BENCH/CORRECTNESS after the
   round's final commit; `git add` them first);
3. the next window as a paste-ready Python literal, grouped by
   last-certified driver round with the same comment style the list in
   plans/__init__.py uses;
4. the pre-verify command (driver_sim --only over the new window);
5. the remaining checklist items (CATALOG.md regen, FIXTURES re-probe).
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from certification import (  # noqa: E402
    PARITY_PINNED,
    driver_history,
    rotation_window,
)


def tracked_correctness_rounds(repo: Path = REPO) -> list[int]:
    """Round numbers of git-TRACKED CORRECTNESS artifacts (the forcing
    function keys off tracked state, not the working tree)."""
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(
        int(m.group(1))
        for f in out
        if (m := re.search(r"_r0*(\d+)\.json$", f))
    )


def untracked_driver_artifacts(repo: Path = REPO) -> list[str]:
    """BENCH/CORRECTNESS files on disk but not yet committed."""
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "BENCH_r*.json", "CORRECTNESS_r*.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    on_disk = sorted(
        p.name
        for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json")
        for p in repo.glob(pat)
    )
    return [f for f in on_disk if f not in tracked]


def window_literal(window: list[str], upto_round: int, repo: Path = REPO) -> str:
    """The window as a paste-ready Python literal, grouped by the
    last-certified driver round (<= upto_round), matching the comment
    style of the existing list in plans/__init__.py."""
    drv = driver_history(repo)

    def last(name: str) -> int:
        return max(
            (r for r, g in drv.get(name, {}).items() if g and r <= upto_round),
            default=0,
        )

    lines = ["DRIVER_WINDOW = ["]
    prev_group: int | None = None
    n_pinned = len(PARITY_PINNED)
    for i, name in enumerate(window):
        if i < n_pinned:
            lines.append(f'    "{name}",')
            continue
        grp = last(name)
        if grp != prev_group:
            count = sum(
                1 for m in window[n_pinned:] if last(m) == grp
            )
            label = f"r{grp}" if grp else "NEVER (new entry)"
            lines.append(f"    # last certified {label} ({count}):")
            prev_group = grp
        lines.append(f'    "{name}",')
    lines.append("]")
    return "\n".join(lines)


def main() -> int:
    rounds = tracked_correctness_rounds()
    newest = rounds[-1] if rounds else 0
    try:
        from sparkstreamingrealtimedatawithkafka_spark.plans import (
            DRIVER_WINDOW,
            WINDOW_ROUND,
        )
    except ImportError as exc:  # pragma: no cover - broken checkout
        print(f"FATAL: cannot import plans package: {exc}")
        return 2

    # Only WINDOW_ROUND lagging the tracked history means a rotation is
    # due. WINDOW_ROUND *ahead* of it means the previous round's driver
    # artifact hasn't been committed yet — pointing at a downgrade there
    # would instruct undoing a correct bump (r13 advice).
    due = WINDOW_ROUND < newest + 1
    ahead = WINDOW_ROUND > newest + 1
    print(f"newest git-tracked CORRECTNESS round: r{newest}")
    print(f"package WINDOW_ROUND:                 {WINDOW_ROUND}")
    if due:
        print(
            "rotation: DUE — bump WINDOW_ROUND to "
            f"{newest + 1} and regenerate the list below"
        )
    elif ahead:
        print(
            "rotation: WINDOW_ROUND is ahead of tracked history — commit "
            f"CORRECTNESS_r{WINDOW_ROUND - 1}.json (see untracked-artifacts "
            "step below), do NOT downgrade WINDOW_ROUND"
        )
    else:
        print("rotation: current (WINDOW_ROUND == newest tracked + 1)")

    loose = untracked_driver_artifacts()
    if loose:
        print(f"\nuntracked driver artifacts (git add these FIRST): {loose}")
    else:
        print("\nuntracked driver artifacts: none")

    target = newest + 1 if due else WINDOW_ROUND
    window = rotation_window(target - 1)
    if not due and window == list(DRIVER_WINDOW):
        print("window list: matches rotation_window policy — nothing to paste")
    else:
        print(
            f"\n--- paste into plans/__init__.py "
            f"(with WINDOW_ROUND = {target}) ---"
        )
        print(window_literal(window, target - 1))
        print("--- end paste ---")

    print(
        "\npre-verify: python tools/driver_sim.py /root/testdata/sf0.01 "
        "--only " + ",".join(window)
    )
    print(
        "then: pytest tests/test_catalog_window.py -q; "
        "python tools/gen_catalog.py; re-probe FIXTURES.md asks; "
        "full gates (sf0.01 + sf0.1) AFTER the round's last plan commit."
    )
    return 1 if due or ahead or loose else 0


if __name__ == "__main__":
    raise SystemExit(main())
