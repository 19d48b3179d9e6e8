#!/usr/bin/env python
"""Inference + explanation entry point — CLI-compatible with the reference's test.py."""

from scouter_tpu.explain.cli import main

if __name__ == "__main__":
    main()
