#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train_atr2 with the reference's worker
auto-bump (reference train_ATR2_fix_workers.py:154-156: on >=32-core hosts
use 8 loader workers / prefetch_factor 4)."""
import os

from magicmirror.cli.train_atr2 import main

if __name__ == "__main__":
    argv = None
    if (os.cpu_count() or 0) >= 32:
        import sys

        argv = sys.argv[1:]
        if "--workers" not in " ".join(argv):
            argv = argv + ["--workers", "8", "--prefetch_factor", "4"]
    main(argv)
