#!/usr/bin/env python
"""Entry shim → magicmirror.cli.generate_market (reference-compatible CLI surface)."""
from magicmirror.cli.generate_market import main

if __name__ == "__main__":
    main()
