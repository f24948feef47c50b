#!/usr/bin/env python
"""Unpaired inference CLI (reference: code/infer_unpaired.py).

Usage: python infer_unpaired.py --opt ./confs/LOL.yml  (requires
``dataroot_unpaired`` in the conf)
"""

from glare_tpu.cli.infer_unpaired import main

if __name__ == "__main__":
    main()
