#!/usr/bin/env python
"""LOL-v2-real paired inference CLI (reference: code/infer_dataset_lolv2-real.py).

Usage: python infer_dataset_lolv2-real.py --opt ./confs/LOL-v2-real.yml
"""

from glare_tpu.cli.infer_paired import main

if __name__ == "__main__":
    main(default_conf="./confs/LOL-v2-real.yml")
