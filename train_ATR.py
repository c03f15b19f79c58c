#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train_atr (reference-compatible CLI surface)."""
from magicmirror.cli.train_atr import main

if __name__ == "__main__":
    main()
