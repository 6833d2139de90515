"""Mesh-F1 CLI over a nearest.jsonl retrieval dump.

Reference invocation reads `nearest.jsonl` in CWD with hard-coded ShapeNet
and val_map paths (calculate_f1.py:15,227-246); here they are configurable:

    python calculate_f1.py \\
        +nearest_path=nearest.jsonl \\
        +val_map_path=data/text2shape-data/shapenet/preprocessed/exp_data/val_map.json \\
        +shapenet_root=data/text2shape-data/ShapeNetCore.v2

Prints the mean top-1 mesh F1@0.1 over evaluable queries.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config
    from tricolo_tpu.evaluation.f1_mesh import run_f1_over_nearest

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    mean_f1 = run_f1_over_nearest(
        nearest_path=cfg.get("nearest_path", "nearest.jsonl"),
        val_map_path=cfg.get(
            "val_map_path",
            "data/text2shape-data/shapenet/preprocessed/exp_data/val_map.json",
        ),
        shapenet_root=cfg.get("shapenet_root", "data/text2shape-data/ShapeNetCore.v2"),
        cache_dir=cfg.get("point_cache_dir", "point_cache"),
    )
    print(mean_f1)


if __name__ == "__main__":
    main()
