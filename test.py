#!/usr/bin/env python
"""Entry shim → magicmirror.cli.test (reference-compatible CLI surface)."""
from magicmirror.cli.test import main

if __name__ == "__main__":
    main()
