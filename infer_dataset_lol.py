#!/usr/bin/env python
"""LOL paired inference CLI (reference: code/infer_dataset_lol.py).

Usage: python infer_dataset_lol.py --opt ./confs/LOL.yml
"""

from glare_tpu.cli.infer_paired import main

if __name__ == "__main__":
    main(default_conf="./confs/LOL.yml")
