"""Run a TPU stage under a tunnel-flap watchdog.

The axon tunnel can wedge a client FOREVER: the process connects, sends
its first compile/execute, and the reply never arrives — 0 CPU seconds
while the wall clock runs (observed repeatedly this round; the kernel
shows the main thread on a futex and one epoll thread on the tunnel
socket). A wedged client cannot recover; the only fix is kill + retry
when the tunnel answers again.

This wrapper makes long measurement sessions survivable:

  1. PROBE: run a trivial device op in a killable subprocess until it
     succeeds (sleep between attempts) — never start real work against
     a dead tunnel.
  2. RUN: launch the stage; watch /proc/<pid> CPU time. A healthy stage
     burns CPU (compiles trace on host, results process on host); a
     wedged one flatlines. If CPU time advances less than MIN_CPU_DELTA
     over STALL_SECS, kill the process tree and go back to 1.
  3. Give up after --retries attempts (exit 75, EX_TEMPFAIL).

Usage: python benchmarks/tpu_watchdog.py [--retries N] [--stall SECS]
           [--timeout SECS] -- <command...>
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

PROBE = ("import jax, jax.numpy as jnp; "
         "x = jnp.ones((256, 256)); print(float(jnp.sum(x)))")


def log(*a):
    print("[watchdog]", *a, file=sys.stderr, flush=True)


def probe_ok(timeout_s: float = 90.0) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(sleep_s: float = 45.0, max_wait_s: float = 3600.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait_s:
        if probe_ok():
            return True
        log(f"tunnel not answering; retry in {sleep_s:.0f}s")
        time.sleep(sleep_s)
    return False


def cpu_seconds(pid: int) -> float:
    """utime+stime of pid AND its direct children (the stage may be a
    shell/pytest spawning the real worker)."""
    total = 0.0
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        total += (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
        # cutime/cstime cover reaped children; live children need a walk.
        total += (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
        for child in os.listdir(f"/proc/{pid}/task"):
            cpath = f"/proc/{pid}/task/{child}/children"
            try:
                with open(cpath) as f:
                    kids = f.read().split()
            except OSError:
                continue
            for kid in kids:
                total += cpu_seconds(int(kid))
    except (OSError, IndexError, ValueError):
        pass
    return total


def run_once(cmd, stall_secs: float, min_cpu_delta: float,
             timeout_s: float) -> int | None:
    """Run cmd; return its exit code, or None if killed as wedged."""
    proc = subprocess.Popen(cmd, start_new_session=True)
    t_start = time.monotonic()
    last_cpu = 0.0
    last_advance = t_start
    try:
        while True:
            try:
                rc = proc.wait(timeout=10)
                return rc
            except subprocess.TimeoutExpired:
                pass
            now = time.monotonic()
            if now - t_start > timeout_s:
                log(f"stage exceeded {timeout_s:.0f}s total; killing")
                _kill_tree(proc)
                return 124
            cpu = cpu_seconds(proc.pid)
            if cpu - last_cpu >= min_cpu_delta:
                last_cpu = cpu
                last_advance = now
            elif now - last_advance > stall_secs:
                log(f"no CPU progress for {stall_secs:.0f}s "
                    f"(cpu={cpu:.1f}s) — wedged; killing for retry")
                _kill_tree(proc)
                return None
    finally:
        if proc.poll() is None:
            _kill_tree(proc)


def _kill_tree(proc: subprocess.Popen) -> None:
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except OSError:
        proc.kill()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--stall", type=float, default=180.0,
                   help="kill after this many seconds without CPU progress")
    p.add_argument("--min-cpu-delta", type=float, default=2.0,
                   help="CPU seconds that must accrue within each --stall "
                        "window; >= 2.0 because a wedged jax client's "
                        "heartbeat threads trickle ~0.1-0.5s/window and "
                        "must not count as progress")
    p.add_argument("--timeout", type=float, default=3600.0,
                   help="hard per-attempt wall limit")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given")

    for attempt in range(1, args.retries + 1):
        if not wait_for_tunnel():
            log("tunnel never answered; giving up")
            return 75
        log(f"attempt {attempt}/{args.retries}: {' '.join(cmd)}")
        rc = run_once(cmd, args.stall, args.min_cpu_delta, args.timeout)
        if rc is not None:
            return rc
        time.sleep(30)  # let the tunnel drop the dead session
    log("all attempts wedged")
    return 75


if __name__ == "__main__":
    sys.exit(main())
