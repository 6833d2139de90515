"""Preprocessing CLI.

Invocation parity with the reference (README.md:78-82):

    python preprocess.py data=text2shape_chair_table +cpu_workers=8

(the reference's path is ``data/preprocess_all_data.py``; same flags here).
Builds caption maps, renders multi-view images (software rasterizer; the
reference used pyrender/EGL) and packs per-model npz files.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config
    from tricolo_tpu.data.preprocess import preprocess_all

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    preprocess_all(cfg, cpu_workers=int(cfg.get("cpu_workers", 8)))


if __name__ == "__main__":
    main()
