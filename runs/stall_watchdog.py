#!/usr/bin/env python
"""Kill hung TPU queue stages so retries happen in minutes, not hours.

Failure mode (seen twice): the axon tunnel drops mid-RPC and the training
process blocks forever on a dead socket — zero CPU, zero file writes —
while the stage's `timeout` still has hours to run. The queue can only
retry after the stage exits, so a 6 h timeout burns the whole window.

Decision rule (conservative; all three must hold for STALL_SEC):
  1. the stage process group (pgid from /tmp/qv6_stage.pid) accumulated
     < CPU_EPS seconds of CPU time over the window (a live run feeding
     the TPU always burns host CPU on batch gather/dispatch; a remote
     compile is idle but finishes well under STALL_SEC),
  2. nothing under runs/ or .jax_cache/ was written in the window
     (training writes metrics.jsonl every few minutes; final evals write
     a png per view; compiles write the cache on completion),
  3. a bounded probe of the TPU tunnel SUCCEEDS — if the tunnel is down
     the stage can do nothing anyway and killing it would just respawn
     into the same outage; the queue's `ensure` gate handles that case.

On trigger: TERM the process group, escalate to KILL after 60 s. The
queue's run_stage verifies artifacts, sees them incomplete, and retries
with resume=True from the latest checkpoint.

Run: nohup python runs/stall_watchdog.py >> runs/tpu_queue.log 2>&1 &
"""
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PIDFILE = Path("/tmp/qv6_stage.pid")
POLL_SEC = 120
STALL_SEC = 1800
CPU_EPS = 5.0  # seconds of group CPU over the stall window
CLK = os.sysconf("SC_CLK_TCK")


def log(msg):
    print(f"wd: {msg} {time.strftime('%a %b %d %H:%M:%S UTC %Y', time.gmtime())}",
          flush=True)


def group_cpu_seconds(pgid):
    """Sum utime+stime over every process in the group; None if empty."""
    total, found = 0.0, False
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                st = f.read()
            # comm can contain spaces/parens: parse after the last ')'
            fields = st[st.rindex(")") + 2:].split()
            # fields[0] is state; pgrp is fields[2]; utime/stime 11/12
            if int(fields[2]) != pgid:
                continue
            total += (int(fields[11]) + int(fields[12])) / CLK
            found = True
        except (OSError, ValueError, IndexError):
            continue
    return total if found else None


def leader_starttime(pgid):
    """starttime (clock ticks since boot) of the group leader, or None.

    /tmp/qv6_stage.pid can outlive its stage (queue died before cleanup);
    if the kernel recycles the pid for an unrelated idle process group,
    killpg would TERM innocents after 30 min. The leader's starttime is
    immutable per pid incarnation; recording it when a group is first
    seen and re-verifying before every signal pins the window and the
    kill to one incarnation, and `pid_predates_file` rejects leaders
    born AFTER the pidfile was written (recycled before first sight)."""
    try:
        with open(f"/proc/{pgid}/stat") as f:
            st = f.read()
        fields = st[st.rindex(")") + 2:].split()
        return int(fields[19])  # starttime is stat field 22 (1-indexed)
    except (OSError, ValueError, IndexError):
        return None


def _boot_epoch():
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("btime "):
                    return int(line.split()[1])
    except OSError:
        pass
    return None


def pid_predates_file(starttime, pidfile=PIDFILE, slack_s=5.0):
    """True if the leader incarnation started BEFORE the pidfile was
    written (+slack): a legitimate stage writes its pid right after
    spawning, so a leader born after the file's mtime is a recycled pid
    and must never be adopted, even on the watchdog's first sight."""
    if starttime is None:
        return False
    bt = _boot_epoch()
    if bt is None:
        return True  # can't verify; keep legacy behavior
    try:
        mtime = pidfile.stat().st_mtime
    except OSError:
        return False
    return bt + starttime / CLK <= mtime + slack_s


def newest_artifact_mtime():
    newest = 0.0
    for root in (REPO / "runs", REPO / ".jax_cache"):
        if not root.exists():
            continue
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                try:
                    m = os.stat(os.path.join(dirpath, fn)).st_mtime
                except OSError:
                    continue
                if m > newest:
                    newest = m
    return newest


def tunnel_ok(timeout_s=240):
    code = ("import jax; d = jax.devices(); "
            "assert d and d[0].platform != 'cpu'; "
            "import jax.numpy as jnp; "
            "assert float(jnp.ones(8).sum()) == 8.0")
    try:
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True,
                              timeout=timeout_s).returncode == 0
    except Exception:
        return False


def should_kill(cpu_delta, write_age, tunnel_live, stall_sec=STALL_SEC,
                cpu_eps=CPU_EPS):
    """Pure decision rule (unit-tested in tests/test_queue_gate.py).

    The tunnel_live requirement avoids killing a stage that is merely
    waiting out an outage (one recorded stall recovered when the relay
    revived). But the probe itself can fail exactly when the hung client
    wedges the tunnel, so after 3x the stall window with zero CPU the
    stage is killed regardless: the queue's ensure-gate then waits for
    the tunnel cleanly and resumes the instant it returns, instead of
    burning the stage's multi-hour timeout.
    """
    if cpu_delta is None or write_age is None:
        return False
    stalled = cpu_delta < cpu_eps and write_age > stall_sec
    return stalled and (tunnel_live or write_age > 3 * stall_sec)


def main():
    log("watchdog up")
    last = {}  # pgid -> (t, cpu)
    while True:
        time.sleep(POLL_SEC)
        try:
            pgid = int(PIDFILE.read_text().strip())
        except (OSError, ValueError):
            last.clear()
            continue
        cpu = group_cpu_seconds(pgid)
        start = leader_starttime(pgid)
        now = time.time()
        if cpu is None:
            last.pop(pgid, None)
            continue
        if pgid not in last or last[pgid][2] != start:
            # new group, or the pid was recycled since last poll:
            # restart the observation window on this incarnation —
            # unless the incarnation is younger than the pidfile, in
            # which case it is a recycled pid, not our stage
            if pid_predates_file(start):
                last = {pgid: (now, cpu, start)}
            else:
                last.pop(pgid, None)
            continue
        t0, cpu0, start0 = last[pgid]
        if cpu - cpu0 >= CPU_EPS:
            last[pgid] = (now, cpu, start)  # progress: restart the window
            continue
        if now - t0 < STALL_SEC:
            continue
        write_age = now - newest_artifact_mtime()
        if not should_kill(cpu - cpu0, write_age, tunnel_ok()):
            if write_age <= STALL_SEC:
                last[pgid] = (now, cpu, start)  # files moved: restart
            continue
        if leader_starttime(pgid) != start0:
            # pid recycled between the window and the signal: never
            # killpg a different incarnation
            last.pop(pgid, None)
            continue
        log(f"STALL pgid {pgid}: cpu+{cpu - cpu0:.1f}s in "
            f"{now - t0:.0f}s, last write {write_age:.0f}s ago, "
            f"tunnel live -> TERM group")
        try:
            os.killpg(pgid, 15)
        except ProcessLookupError:
            last.pop(pgid, None)
            continue
        time.sleep(60)
        try:
            os.killpg(pgid, 9)
            log(f"escalated KILL pgid {pgid}")
        except ProcessLookupError:
            pass
        last.pop(pgid, None)


if __name__ == "__main__":
    main()
