#!/usr/bin/env python
"""Entry shim → magicmirror.cli.template_animation (reference-compatible CLI surface)."""
from magicmirror.cli.template_animation import main

if __name__ == "__main__":
    main()
