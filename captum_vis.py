#!/usr/bin/env python
"""Layer-DeepLift comparison entry point — CLI-compatible with the reference's
captum_vis.py (same skeleton as torchcam_vis.py driving DeepLift attribution)."""

import sys

from scouter_tpu.explain.compare_cli import main

if __name__ == "__main__":
    argv = sys.argv[1:] + ["--methods", "deeplift"]
    main(argv)
