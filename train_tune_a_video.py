#!/usr/bin/env python
"""CLI shim with the reference's invocation shape:

    python train_tune_a_video.py --config config/tune/X.yaml

All logic lives in fatezero_tpu.cli.train.
"""
from fatezero_tpu.cli.train import main

if __name__ == "__main__":
    main()
