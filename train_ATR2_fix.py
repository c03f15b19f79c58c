#!/usr/bin/env python
"""Entry shim → magicmirror.cli.train_atr2 (reference train_ATR2_fix.py: the
seed-fixed recipe — full set_seed hygiene is the default in this framework,
JAX PRNG keys are deterministic by construction)."""
from magicmirror.cli.train_atr2 import main

if __name__ == "__main__":
    main()
