"""Offline tool: torchvision ResNet state_dict → pretrained backbone npz.

The reference's MVCNN loads ImageNet-pretrained torchvision ResNets
(reference mv_cnn.py:44-52); this environment has no network egress, so
conversion is a one-time host step wherever weights are available:

    # from a downloaded state_dict file
    python convert_torchvision_weights.py +src=resnet18.pth \\
        +cnn_name=resnet18 +out=pretrained/resnet18.npz

    # or, on a connected host, straight from torchvision
    python convert_torchvision_weights.py +cnn_name=resnet18 \\
        +out=pretrained/resnet18.npz

Point ``model.modules.MVCNNEncoder.pretrained_path`` at the output; the
Trainer grafts it over the random init at state creation.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None):
    from tricolo_tpu.config import load_config
    from tricolo_tpu.models.efficientnet import convert_efficientnet_state_dict
    from tricolo_tpu.models.resnet import convert_torchvision_state_dict, save_pretrained

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    cnn_name = cfg.get("cnn_name", "resnet18")
    out = cfg.get("out", f"pretrained/{cnn_name}.npz")
    src = cfg.get("src", None)
    is_efficientnet = cnn_name.startswith("efficientnet")

    import torch

    if src:
        state_dict = torch.load(src, map_location="cpu")
        if "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
    elif is_efficientnet:
        # Reference dependency (mv_cnn.py:53-58); dashed name for its zoo.
        from efficientnet_pytorch import EfficientNet

        model = EfficientNet.from_pretrained(cnn_name.replace("_", "-"))
        state_dict = model.state_dict()
    else:
        import torchvision.models as tvm

        model = getattr(tvm, cnn_name)(weights="IMAGENET1K_V1")
        state_dict = model.state_dict()

    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    convert = (
        convert_efficientnet_state_dict if is_efficientnet
        else convert_torchvision_state_dict
    )
    params, stats = convert(state_dict, cnn_name)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_pretrained(out, params, stats)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
