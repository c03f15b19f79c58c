#!/usr/bin/env python
"""Entry shim → magicmirror.cli.single_img (reference-compatible CLI surface)."""
from magicmirror.cli.single_img import main

if __name__ == "__main__":
    main()
