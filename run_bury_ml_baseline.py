#!/usr/bin/env python
"""Root CLI shim matching the reference entry point name.

Delegates to upgdm_tpu.eval.bury (Bury et al. PNAS deep-learning EWS baseline).
"""
from upgdm_tpu.eval.bury import main

if __name__ == "__main__":
    main()
