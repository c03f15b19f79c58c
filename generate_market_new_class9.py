#!/usr/bin/env python
"""Entry shim → magicmirror.cli.generate_market --new_class9 (reference
generate_market_new_class9.py: pair-id mean-texture synthesis)."""
import sys

from magicmirror.cli.generate_market import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--new_class9"])
