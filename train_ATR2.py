#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train_atr2 (reference-compatible CLI surface)."""
from magicmirror.cli.train_atr2 import main

if __name__ == "__main__":
    main()
