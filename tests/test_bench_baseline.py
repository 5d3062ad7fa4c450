"""bench.py baseline selection — the contract, pinned (r9 advice).

The ambiguity being pinned: at the close of round N the driver has just
written CORRECTNESS_rN and runs bench; the builder's first run of round
N+1 sees the IDENTICAL file state. The default must therefore never pick
bench_rN_local (the same code the driver is currently measuring — the
self-comparison bug), and the builder reaches bench_rN_local only via an
explicit $BENCH_ROUND / $BENCH_PREV_RECORD.
"""

from __future__ import annotations

from bench import baseline_records


def _repo(tmp_path, driver_rounds=(8, 9), local_rounds=(8, 9)):
    (tmp_path / "tools").mkdir()
    for n in driver_rounds:
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text("{}")
    for n in local_rounds:
        (tmp_path / "tools" / f"bench_r{n}_local.json").write_text("{}")
    return tmp_path


def test_default_excludes_boundary_round_record(tmp_path):
    """Driver at close of round 9 (CORRECTNESS_r09 just written): the
    baseline must be bench_r8_local, never this round's bench_r9_local."""
    repo = _repo(tmp_path)
    got = baseline_records(repo, {})
    assert [p.name for p in got] == ["bench_r8_local.json"]


def test_bench_round_env_admits_prior_round_record(tmp_path):
    """Builder inside round 10 sets BENCH_ROUND=10: bench_r9_local is the
    correct round-over-round baseline and becomes eligible."""
    repo = _repo(tmp_path)
    got = baseline_records(repo, {"BENCH_ROUND": "10"})
    assert [p.name for p in got] == [
        "bench_r8_local.json",
        "bench_r9_local.json",
    ]


def test_bench_round_env_still_excludes_own_round(tmp_path):
    """BENCH_ROUND=9 (a re-run labeled as round 9) must not see round 9's
    own record."""
    repo = _repo(tmp_path, local_rounds=(7, 8, 9))
    got = baseline_records(repo, {"BENCH_ROUND": "9"})
    assert [p.name for p in got][-1] == "bench_r8_local.json"


def test_prev_record_override_wins(tmp_path):
    repo = _repo(tmp_path)
    got = baseline_records(
        repo, {"BENCH_PREV_RECORD": "tools/bench_r7_local.json", "BENCH_ROUND": "10"}
    )
    assert [str(p) for p in got] == ["tools/bench_r7_local.json"]


def test_round_one_has_no_baseline(tmp_path):
    """No driver artifacts at all (round 1): nothing is eligible, even if
    a same-round local record already exists."""
    repo = _repo(tmp_path, driver_rounds=(), local_rounds=(1,))
    assert baseline_records(repo, {}) == []
