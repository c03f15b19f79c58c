#!/usr/bin/env python
"""Entry shim → magicmirror.cli.show_camera (reference-compatible CLI surface)."""
from magicmirror.cli.show_camera import main

if __name__ == "__main__":
    main()
