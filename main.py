#!/usr/bin/env python
"""Pretraining CLI shim (flag-compatible with the reference main.py)."""
from selavi_tpu.cli.main import main

if __name__ == "__main__":
    main()
