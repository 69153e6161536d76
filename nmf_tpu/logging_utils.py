"""Run logging: JSONL metrics stream + optional TensorBoard.

Replaces the reference's loguru + torch SummaryWriter stack
(train.py:227-232, 672-702): every run writes machine-readable
``metrics.jsonl`` (one JSON object per event) and, when tensorboard is
importable, mirrors scalars there. Telemetry keeps the reference's
rays/sec + sample-count counters (train.py:783-803).
"""
import json
import time
from pathlib import Path


class RunLogger:
    def __init__(self, logdir, echo=print):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        mfile = self.logdir / "metrics.jsonl"
        # resume continuity: `t` must keep counting total wall-clock across
        # restarts (resume=True appends to the same file), else
        # time-to-PSNR reporting (tabularize --time-to-db) understates
        # resumed runs. Offset the clock by the last recorded t.
        prev_t = 0.0
        if mfile.exists():
            try:
                for line in mfile.read_text().splitlines()[::-1]:
                    rec = json.loads(line)
                    if "t" in rec:
                        prev_t = float(rec["t"])
                        break
            except (ValueError, OSError):
                pass
        self._f = open(mfile, "a")
        self._echo = echo
        self._t0 = time.time() - prev_t
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            pass

    def scalars(self, step, **kwargs):
        rec = {"step": step, "t": round(time.time() - self._t0, 3), **kwargs}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in kwargs.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"train/{k}", v, step)

    def info(self, msg):
        self._echo(msg)
        self._f.write(json.dumps({"log": msg,
                                  "t": round(time.time() - self._t0, 3)})
                      + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
