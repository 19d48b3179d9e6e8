#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference's train.py flags."""

from scouter_tpu.train.cli import main

if __name__ == "__main__":
    main()
