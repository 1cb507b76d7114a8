#!/usr/bin/env python
"""Root CLI shim matching the reference entry point name.

Delegates to upgdm_tpu.cli.train_spdata (same --cfg/--train_mode/--repeat
contract as /root/reference/main_SSLtrain_diffusion_spdata.py).
"""
from upgdm_tpu.cli.train_spdata import main

if __name__ == "__main__":
    main()
