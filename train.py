#!/usr/bin/env python
"""CLI entry point: python train.py model=... dataset=... datadir=...

Mirrors the reference's root-level train.py hydra CLI surface."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from nmf_tpu.train import main

if __name__ == "__main__":
    main()
