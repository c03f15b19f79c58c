#!/usr/bin/env python
"""Entry shim → magicmirror.cli.show_rainbow2 (reference-compatible CLI surface)."""
from magicmirror.cli.show_rainbow2 import main

if __name__ == "__main__":
    main()
