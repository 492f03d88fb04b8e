"""Per-dataset entry-point mirrors of the reference's `run/` scripts.

The reference ships ten `__main__` scripts (`run/train/train_*.py`,
`run/test/test_*.py`); here each is a preset over the single
`fashionern` CLI so recipes translate verbatim:

    python -m torch.distributed.launch ... run/train_fiq.py --lr 4e-5 ...
becomes
    python -m fashionern_aaai2024_tpu.run.train_fiq --lr 4e-5 --data-root ...

(no launcher needed — one process drives the whole mesh).
"""

import sys

from fashionern_aaai2024_tpu.cli.main import main as _main


def _run(command: str, dataset: str) -> int:
    argv = sys.argv[1:]
    return _main([command, "--dataset", dataset, *argv])
