#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train (reference-compatible CLI surface)."""
from magicmirror.cli.train import main

if __name__ == "__main__":
    main()
