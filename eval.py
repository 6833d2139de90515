"""Offline evaluation of saved prediction pickles.

The reference ships a broken version of this entry (imports a non-existent
re-export and passes an unknown kwarg — reference eval.py:2-11, README.md:118
"currently unavailable"). This one works:

    python eval.py +prediction_file_path=output/.../predictions/output.p

reads the ``output.p`` pickle written by test.py and prints
"RR@1 RR@5 NDCG@5 MRR".
"""

from __future__ import annotations

import pickle
import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config
    from tricolo_tpu.evaluation import compute_metrics

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    path = cfg.get("prediction_file_path", None)
    assert path, "pass +prediction_file_path=<output.p>"
    with open(path, "rb") as f:
        embeddings_dict = pickle.load(f)
    compute_metrics(embeddings_dict, print_results=True, nearest_path=None)


if __name__ == "__main__":
    main()
