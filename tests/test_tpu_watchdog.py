"""Tunnel-flap watchdog (benchmarks/tpu_watchdog.py): the harness that
keeps on-chip measurement sessions alive across axon tunnel wedges.

These tests run the generic process machinery on CPU subprocesses — the
wedge signature (wall advances, CPU flatlines) is simulated with sleep;
healthy stages with a busy loop."""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))
import tpu_watchdog  # noqa: E402


def test_cpu_seconds_tracks_own_process():
    t0 = time.process_time()
    while time.process_time() - t0 < 0.3:
        sum(range(1000))
    assert tpu_watchdog.cpu_seconds(os.getpid()) >= 0.2


def test_run_once_kills_flatlined_process():
    """A process burning no CPU (pure sleep — the wedge signature) is
    killed after the stall window and reported as None (= retry)."""
    t0 = time.monotonic()
    rc = tpu_watchdog.run_once(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        stall_secs=2.0, min_cpu_delta=0.2, timeout_s=600.0)
    assert rc is None
    assert time.monotonic() - t0 < 60  # killed at the stall, not timeout


def test_run_once_passes_healthy_process_through():
    """A stage that burns CPU and exits returns its real exit code."""
    code = ("import time\n"
            "t0 = time.process_time()\n"
            "while time.process_time() - t0 < 1.0:\n"
            "    sum(range(10000))\n")
    rc = tpu_watchdog.run_once([sys.executable, "-c", code],
                               stall_secs=30.0, min_cpu_delta=0.2,
                               timeout_s=120.0)
    assert rc == 0


def test_run_once_propagates_failure_exit_code():
    rc = tpu_watchdog.run_once(
        [sys.executable, "-c", "raise SystemExit(7)"],
        stall_secs=30.0, min_cpu_delta=0.2, timeout_s=60.0)
    assert rc == 7


def test_cpu_seconds_includes_children():
    """The stage may be a shell/pytest wrapping the real worker — child
    CPU counts toward progress."""
    import subprocess

    code = ("import subprocess, sys\n"
            "subprocess.run([sys.executable, '-c', "
            "'''import time\n"
            "t0 = time.process_time()\n"
            "while time.process_time() - t0 < 1.0: sum(range(10000))\n"
            "time.sleep(3)''' ])\n")
    proc = subprocess.Popen([sys.executable, "-c", code])
    try:
        time.sleep(2.5)  # child busy-looped ~1s and is now sleeping, alive
        assert tpu_watchdog.cpu_seconds(proc.pid) >= 0.5
    finally:
        proc.kill()
        proc.wait()


def test_wait_for_tunnel_retries_then_succeeds(monkeypatch):
    calls = []

    def fake_probe(timeout_s=90.0):
        calls.append(1)
        return len(calls) >= 3

    monkeypatch.setattr(tpu_watchdog, "probe_ok", fake_probe)
    assert tpu_watchdog.wait_for_tunnel(sleep_s=0.01, max_wait_s=30.0)
    assert len(calls) == 3


def test_wait_for_tunnel_gives_up(monkeypatch):
    monkeypatch.setattr(tpu_watchdog, "probe_ok",
                        lambda timeout_s=90.0: False)
    assert not tpu_watchdog.wait_for_tunnel(sleep_s=0.01, max_wait_s=0.05)
