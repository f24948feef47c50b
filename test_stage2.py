#!/usr/bin/env python
"""Stage-2 checkpoint sweep evaluator (reference: code/test_stage2.py)."""

from glare_tpu.cli.test_stages import main

if __name__ == "__main__":
    main(stage=2)
