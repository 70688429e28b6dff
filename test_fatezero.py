#!/usr/bin/env python
"""CLI shim with the reference's invocation shape:

    python test_fatezero.py --config config/teaser/jeep_watercolor.yaml

All logic lives in fatezero_tpu.cli.edit.
"""
from fatezero_tpu.cli.edit import main

if __name__ == "__main__":
    main()
