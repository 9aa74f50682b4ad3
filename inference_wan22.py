#!/usr/bin/env python
"""FantasyWorld-Wan2.2 dual-model inference entry point (reference-compatible
CLI). See fantasy_world_tpu/cli/infer_wan22.py for the flag surface."""
from fantasy_world_tpu.cli.infer_wan22 import main

if __name__ == "__main__":
    main()
