"""Inference/testing entry point.

Invocation parity with the reference (README.md:109-115, test.py:10-36):

    python test.py data=text2shape_chair_table experiment_name=tri \\
        model.voxel_encoder=SparseCNNEncoder +ckpt_path=output/.../epoch=19.ckpt

Loads the checkpoint (pruning disabled-encoder params, test.py:20-28), runs
the ``inference.split`` split, prints "RR@1 RR@5 NDCG@5 MRR", writes
``output.p`` under inference.output_dir and ``nearest.jsonl`` in CWD.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    from train import _apply_platform_override

    _apply_platform_override(cfg)

    if cfg.experiment_name is None:
        cfg.experiment_name = "default"
        from tricolo_tpu.config import resolve_interpolations

        resolve_interpolations(cfg)

    ckpt_path = cfg.get("ckpt_path", None)
    assert ckpt_path and os.path.exists(ckpt_path), (
        "Error: Checkpoint path does not exists."
    )
    os.makedirs(cfg.inference.output_dir, exist_ok=True)

    from tricolo_tpu.data import DataModule
    from tricolo_tpu.training import Trainer

    trainer = Trainer(cfg)
    trainer.test(DataModule(cfg), ckpt_path)


if __name__ == "__main__":
    main()
