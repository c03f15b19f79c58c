#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train_market (reference-compatible CLI surface)."""
from magicmirror.cli.train_market import main

if __name__ == "__main__":
    main()
