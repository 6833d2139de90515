from .bigru import BiGRUEncoder, GRULayer
from .clip_heads import CLIPImageEncoder, CLIPTextEncoder
from .mvcnn import MVCNNEncoder
from .resnet import ResNet, convert_torchvision_state_dict, load_pretrained, save_pretrained
from .tricolo_net import FEATURE_KEYS, TriCoLoNet
from .voxel_cnn import VoxelCNNEncoder

__all__ = [
    "BiGRUEncoder",
    "GRULayer",
    "CLIPImageEncoder",
    "CLIPTextEncoder",
    "MVCNNEncoder",
    "ResNet",
    "convert_torchvision_state_dict",
    "load_pretrained",
    "save_pretrained",
    "FEATURE_KEYS",
    "TriCoLoNet",
    "VoxelCNNEncoder",
]
