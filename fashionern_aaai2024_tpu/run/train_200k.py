"""Mirror of the reference `run/traintrain_200k.py` entry point
(preset: train --dataset fashion200k); flags are the `fashionern train` flags."""

import sys

from fashionern_aaai2024_tpu.run import _run

if __name__ == "__main__":
    sys.exit(_run("train", "fashion200k"))
