#!/usr/bin/env python
"""Stage-2 (conditional flow NLL) training CLI
(reference: code/train_stage2.py).

Usage: python train_stage2.py --opt ./confs/train_stage2_LOL.yml
"""

from glare_tpu.cli.train import main

if __name__ == "__main__":
    main(stage=2)
