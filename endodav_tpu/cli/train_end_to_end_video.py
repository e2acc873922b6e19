"""Training entry point (train_end_to_end_video.py parity): fixed seed
314 (the reference also pins cudnn determinism; XLA is deterministic by
default) then `Trainer(opts).train()`."""

from __future__ import annotations

import random

import numpy as np

from endodav_tpu.options import EndoDAVOptions
from endodav_tpu.train import Trainer


def main():
    opts = EndoDAVOptions().parse()
    random.seed(314)
    np.random.seed(314)
    Trainer(opts).train()


if __name__ == "__main__":
    main()
