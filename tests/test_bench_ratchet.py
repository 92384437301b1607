"""Pins the bench baseline ratchet (VERDICT r14 item 1 / ADVICE r14):
per-query floors are a running MIN across runs, so a slow run can
never raise the regression bar; raising a floor requires an explicit
re-base request that leaves an audit record."""

import json
import os

from bench import apply_rebases, ratchet_floors, settle_rebase_requests

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_floor_only_falls():
    before = {"q1": 1.0, "q2": 5.0}
    now = {"q1": 3.0, "q2": 2.0}
    floors = ratchet_floors(now, before)
    # q1 ran slow: prior floor KEPT (the regressed-query case ADVICE
    # r14 called out — the old roll-forward made q1's 3.0 the new bar)
    assert floors == {"q1": 1.0, "q2": 2.0}


def test_registry_churn():
    before = {"gone": 9.0, "kept": 2.0}
    now = {"kept": 2.5, "new": 4.0}
    floors = ratchet_floors(now, before)
    # dropped queries leave the baseline; new ones enter at first floor
    assert floors == {"kept": 2.0, "new": 4.0}


def test_rebase_raises_floor_and_audits():
    floors = {"q1": 1.0, "q2": 5.0}
    lane = {"v_verify": 0.5}
    applied, remaining = apply_rebases(
        {"q1": "plan change: extra exchange", "nope": "typo"},
        [(floors, {"q1": 3.0, "q2": 4.9}), (lane, {"v_verify": 0.6})],
        0.1,
        "2026-08-16T00:00:00",
    )
    assert floors["q1"] == 3.0  # raised to THIS run's value
    assert floors["q2"] == 5.0  # untouched
    assert [a["query"] for a in applied] == ["q1"]
    assert applied[0]["prior_floor"] == 1.0
    assert applied[0]["reason"] == "plan change: extra exchange"
    # unmatched requests are returned, not silently dropped
    assert remaining == {"nope": "typo"}


def test_rebase_matches_verify_lane():
    floors = {"q1": 1.0}
    lane = {"v_verify": 0.5}
    applied, remaining = apply_rebases(
        {"v_verify": "verify twin now reads staged model"},
        [(floors, {"q1": 1.1}), (lane, {"v_verify": 1.2})],
        0.1,
        "2026-08-16T00:00:00",
    )
    assert lane["v_verify"] == 1.2
    assert not remaining


def test_unmatched_rebase_is_warned_logged_and_consumed(tmp_path, capsys):
    """ADVICE r15: an unmatched request (typoed / since-dropped
    query) used to be silently ignored AND left in the request file,
    where a future same-named query would be re-based to whatever
    that run measured. It is now warned on stderr, logged with
    ``unmatched: true``, and consumed from the request file."""
    req = tmp_path / "BENCH_REBASE.json"
    log = tmp_path / "BENCH_REBASE_LOG.json"
    req.write_text(json.dumps({"typoed_query": "why"}))

    settle_rebase_requests(
        [], {"typoed_query": "why"}, str(req), str(log), 0.1,
        "2026-08-16T00:00:00",
    )
    assert "REBASE UNMATCHED typoed_query" in capsys.readouterr().err
    assert json.loads(req.read_text()) == {}  # consumed
    recorded = json.loads(log.read_text())
    assert recorded == [
        {
            "query": "typoed_query",
            "reason": "why",
            "unmatched": True,
            "sf": 0.1,
            "at": "2026-08-16T00:00:00",
        }
    ]


def test_settle_is_noop_without_requests(tmp_path):
    req = tmp_path / "BENCH_REBASE.json"
    log = tmp_path / "BENCH_REBASE_LOG.json"
    settle_rebase_requests([], {}, str(req), str(log), 0.1, "t")
    assert not req.exists() and not log.exists()


def test_shipped_baseline_is_ratcheted():
    """The committed sf0.1 baseline carries the ratchet marker and
    its seed provenance — a plain roll-forward overwrite would lose
    both (and the r13 floors with them)."""
    path = os.path.join(HERE, "BENCH_BASELINE_sf0.1.json")
    with open(path) as f:
        base = json.load(f)
    assert "min-across-runs" in base.get("ratchet", "")
    assert base["queries"], "baseline must carry per-query floors"
