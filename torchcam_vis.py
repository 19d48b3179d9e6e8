#!/usr/bin/env python
"""Attribution comparison entry point — CLI-compatible with the reference's
torchcam_vis.py (backbone-only saliency from every method, one map per class)."""

from scouter_tpu.explain.compare_cli import main

if __name__ == "__main__":
    main()
