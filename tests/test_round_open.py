"""tools/round_open.py — the round-open checklist helper.

Pins the paste-ready window literal (it must round-trip to exactly the
policy list, with correct group headers) and the tracked-round reader the
rotation-due check keys off. The helper is read-only by contract; these
tests exercise its computation, not any mutation (there is none)."""

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from round_open import (  # noqa: E402
    tracked_correctness_rounds,
    untracked_driver_artifacts,
    window_literal,
)
from certification import rotation_window  # noqa: E402

from sparkstreamingrealtimedatawithkafka_spark.plans import (  # noqa: E402
    DRIVER_WINDOW,
    WINDOW_ROUND,
)


def test_tracked_rounds_sorted_and_reach_r12():
    rounds = tracked_correctness_rounds()
    assert rounds == sorted(rounds)
    assert rounds[-1] >= 12  # r12 closed the certification burn-down


def test_window_literal_round_trips_to_policy_list():
    window = rotation_window(WINDOW_ROUND - 1)
    lit = window_literal(window, WINDOW_ROUND - 1)
    # eval the emitted assignment back into a list
    body = lit.split("=", 1)[1]
    assert ast.literal_eval(body.strip()) == window
    # and the policy list is the committed one (the window test pins this
    # too; here it guards that the literal is generated for the SAME list)
    assert window == list(DRIVER_WINDOW)


# Matches both header forms the literal emits: "r<N>" for certified
# groups and "NEVER (new entry)" for the last=0 group a brand-new entry
# lands in (r13 advice: the NEVER group must count toward the sum too).
_HEADER_RE = re.compile(
    r"# last certified (?:r(\d+)|NEVER \(new entry\)) \((\d+)\):"
)


def test_window_literal_group_headers_count_correctly():
    window = rotation_window(WINDOW_ROUND - 1)
    lit = window_literal(window, WINDOW_ROUND - 1)
    headers = _HEADER_RE.findall(lit)
    assert headers, "expected at least one group header"
    # group counts must sum to the 48 rotating slots
    assert sum(int(c) for _, c in headers) == len(window) - 2
    # groups appear in ascending staleness order (NEVER == round 0 first)
    rounds = [int(r) if r else 0 for r, _ in headers]
    assert rounds == sorted(rounds)


def test_window_literal_counts_never_group(tmp_path):
    """A never-certified entry must land under a counted NEVER header —
    the exact path the old regex missed (r13 advice)."""
    import json
    import shutil

    for p in REPO.glob("CORRECTNESS_r*.json"):
        shutil.copy(p, tmp_path / p.name)
    # A fabricated window containing one name with no certification
    # history anywhere: the literal generator groups it as NEVER.
    window = list(DRIVER_WINDOW[:2]) + ["zz_brand_new_entry"] + list(
        DRIVER_WINDOW[2:10]
    )
    lit = window_literal(window, WINDOW_ROUND - 1, repo=tmp_path)
    headers = _HEADER_RE.findall(lit)
    assert ("", "1") in headers, "NEVER group missing or uncounted"
    assert sum(int(c) for _, c in headers) == len(window) - 2


def test_untracked_artifacts_subset_of_disk():
    loose = untracked_driver_artifacts()
    # every reported name exists on disk and matches the driver pattern
    for name in loose:
        assert (REPO / name).exists()
        assert re.fullmatch(r"(BENCH|CORRECTNESS)_r\d+\.json", name)


def test_rotation_advances_after_simulated_next_round(tmp_path):
    """Dry-run of the r14 round open: fake a CORRECTNESS_r13 that
    certifies the whole current window, and the rotation must advance to
    the next-stalest tier with ZERO overlap against the just-certified
    rotating slots (parity pair stays pinned). This exercises the exact
    path the helper runs at the real round boundary."""
    import json
    import shutil

    from certification import driver_history

    for p in REPO.glob("CORRECTNESS_r*.json"):
        shutil.copy(p, tmp_path / p.name)
    nxt_round = WINDOW_ROUND  # the round the driver certifies next
    fake = {
        n: {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
        }
        for n in DRIVER_WINDOW
    }
    (tmp_path / f"CORRECTNESS_r{nxt_round}.json").write_text(json.dumps(fake))

    nxt = rotation_window(nxt_round, repo=tmp_path)
    assert nxt[:2] == list(DRIVER_WINDOW[:2])  # parity pair pinned
    assert len(nxt) == 50
    # no just-certified rotating slot may reappear immediately
    assert not set(DRIVER_WINDOW[2:]) & set(nxt[2:])
    # the new rotating slots are strictly staler than the round just run
    drv = driver_history(tmp_path)

    def last(name):
        return max(
            (r for r, g in drv.get(name, {}).items() if g and r <= nxt_round),
            default=0,
        )

    assert all(last(n) < nxt_round for n in nxt[2:])
    # and the emitted literal for that future window round-trips too
    lit = window_literal(nxt, nxt_round, repo=tmp_path)
    body = lit.split("=", 1)[1]
    assert ast.literal_eval(body.strip()) == nxt
