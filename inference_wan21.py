#!/usr/bin/env python
"""FantasyWorld-Wan2.1 inference entry point (reference-compatible CLI).

Usage mirrors the reference repo's inference_wan21.py; see
fantasy_world_tpu/cli/infer_wan21.py for the flag surface.
"""
from fantasy_world_tpu.cli.infer_wan21 import main

if __name__ == "__main__":
    main()
