"""Invocation-parity shim: the reference exposes preprocessing at
``python data/preprocess_all_data.py data=<ds> +cpu_workers=N``
(reference README.md:78-82). The implementation lives in
tricolo_tpu.data.preprocess; root-level ``preprocess.py`` is the primary
entry point."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from preprocess import main  # noqa: E402

if __name__ == "__main__":
    main()
