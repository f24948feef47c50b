#!/usr/bin/env python
"""Stage-3 (AFT deformable decoder) training CLI
(reference: code/train_stage3.py).

Usage: python train_stage3.py --opt ./confs/train_stage3_LOL.yml
"""

from glare_tpu.cli.train import main

if __name__ == "__main__":
    main(stage=3)
