"""bench.wait_for_backend: outage-proofing of the driver perf artifact.

The r3 driver bench run died on one transient ``UNAVAILABLE`` at first
backend contact (VERDICT r3 'What's weak' #2); the probe-retry loop must
survive failing probes, respect its budget, and never call the sleep with a
negative backoff.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import wait_for_backend  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        assert s >= 0
        self.t += s


def test_retries_through_failing_first_probes():
    clock = FakeClock()
    calls = []

    def probe(timeout_s):
        calls.append(clock.t)
        clock.t += 10.0  # each probe takes 10s
        return "tpu" if len(calls) >= 3 else None

    logs = []
    platform = wait_for_backend(
        budget_s=600.0,
        probe=probe,
        sleep=clock.sleep,
        clock=clock,
        log=logs.append,
    )
    assert platform == "tpu"
    assert len(calls) == 3
    # backoff grows between attempts (5s, then 10s)
    assert calls[1] - calls[0] >= 15.0  # 10s probe + 5s backoff
    assert calls[2] - calls[1] >= 20.0  # 10s probe + 10s backoff
    assert any("backend up after 3 probes" in m for m in logs)


def test_budget_exhaustion_returns_none():
    clock = FakeClock()
    n = [0]

    def probe(timeout_s):
        n[0] += 1
        clock.t += 110.0  # every probe times out at the full window
        return None

    logs = []
    platform = wait_for_backend(
        budget_s=300.0,
        probe=probe,
        sleep=clock.sleep,
        clock=clock,
        log=logs.append,
    )
    assert platform is None
    assert n[0] >= 2  # retried at least once before giving up
    assert any("budget exhausted" in m for m in logs)


def test_immediate_success_is_silent():
    logs = []
    platform = wait_for_backend(
        budget_s=600.0,
        probe=lambda t: "cpu",
        sleep=lambda s: (_ for _ in ()).throw(AssertionError("no sleep")),
        clock=FakeClock(),
        log=logs.append,
    )
    assert platform == "cpu"
    assert logs == []  # no noise on the happy path
