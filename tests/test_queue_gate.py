"""Artifact gate for the TPU protocol queue (runs/verify_run.sh).

VERDICT r2 weak #1: a queue stage once reported DONE while its run
directory's metrics.jsonl had 0 lines (the run died before the first
flush but exited 0 through the timeout wrapper). The gate must refuse
such runs: a stage passes only with a non-trivially-sized metrics.jsonl
AND the final-eval artifact (imgs_test_all/mean.txt) present and
non-empty. Mirrors the reference's notion of a completed run — the
stats/mean.txt written at the end of evaluation
(/root/reference/renderer.py:508-532).
"""
import subprocess
from pathlib import Path

GATE = Path(__file__).resolve().parent.parent / "runs" / "verify_run.sh"


def _gate(rundir, min_lines=3):
    return subprocess.run(
        ["bash", str(GATE), str(rundir), str(min_lines)]).returncode


def _make_run(tmp_path, metrics_lines, mean_txt):
    d = tmp_path / "run"
    d.mkdir()
    if metrics_lines is not None:
        (d / "metrics.jsonl").write_text(
            "".join('{"iter": %d}\n' % i for i in range(metrics_lines)))
    if mean_txt is not None:
        (d / "imgs_test_all").mkdir()
        (d / "imgs_test_all" / "mean.txt").write_text(mean_txt)
    return d


def test_complete_run_passes(tmp_path):
    d = _make_run(tmp_path, metrics_lines=10, mean_txt="psnr 30.0\n")
    assert _gate(d) == 0


def test_empty_metrics_fails(tmp_path):
    # The exact tensorf_hemi400 failure: file exists, zero lines.
    d = _make_run(tmp_path, metrics_lines=0, mean_txt="psnr 30.0\n")
    assert _gate(d) != 0


def test_too_few_metrics_lines_fails(tmp_path):
    d = _make_run(tmp_path, metrics_lines=2, mean_txt="psnr 30.0\n")
    assert _gate(d, min_lines=3) != 0


def test_missing_metrics_fails(tmp_path):
    d = _make_run(tmp_path, metrics_lines=None, mean_txt="psnr 30.0\n")
    assert _gate(d) != 0


def test_missing_final_eval_fails(tmp_path):
    # Training produced metrics but the final render_test never ran.
    d = _make_run(tmp_path, metrics_lines=10, mean_txt=None)
    assert _gate(d) != 0


def test_empty_mean_txt_fails(tmp_path):
    d = _make_run(tmp_path, metrics_lines=10, mean_txt="")
    assert _gate(d) != 0


def test_missing_rundir_fails(tmp_path):
    assert _gate(tmp_path / "nope") != 0


class TestStallWatchdog:
    """Decision rule of runs/stall_watchdog.py: kill a stage group only
    when it burned ~no CPU over the window AND wrote no artifacts AND the
    tunnel is demonstrably live (a dead-socket hang, not an outage)."""

    def _rule(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "stall_watchdog",
            Path(__file__).parents[1] / "runs" / "stall_watchdog.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.should_kill

    def test_hung_process_killed(self):
        assert self._rule()(cpu_delta=0.0, write_age=2000, tunnel_live=True)

    def test_live_compute_spared(self):
        # burning CPU = healthy even if nothing was written (long compile
        # tail, device-bound timing loop)
        assert not self._rule()(cpu_delta=30.0, write_age=2000,
                                tunnel_live=True)

    def test_recent_writes_spared(self):
        assert not self._rule()(cpu_delta=0.0, write_age=120,
                                tunnel_live=True)

    def test_tunnel_outage_spared_within_grace(self):
        # killing during an outage would respawn into the same outage;
        # the queue's ensure gate owns that case (recorded stalls have
        # recovered on relay revival) — up to the 3x grace window
        assert not self._rule()(cpu_delta=0.0, write_age=2000,
                                tunnel_live=False)

    def test_wedged_tunnel_killed_after_grace(self):
        # a hung client can wedge the tunnel so the probe itself fails;
        # after 3x the stall window with zero CPU, kill regardless and
        # let the queue's ensure gate wait out the outage cleanly
        assert self._rule()(cpu_delta=0.0, write_age=6000,
                            tunnel_live=False)

    def test_vanished_group_spared(self):
        assert not self._rule()(cpu_delta=None, write_age=9999,
                                tunnel_live=True)
