"""TriCoLoNet: composes the configured modality encoders.

Parity with the reference LightningModule's model role (tricolo/model/
tricolo_net.py:11-54): the text encoder is required; image and voxel
encoders are optional; forward produces a dict with "text_features" and,
when configured, "image_features" / "voxel_features", each (B, out_dim).

Encoder selection keys accept both the reference's module names
("SparseCNNEncoder") and the TPU-native names ("VoxelCNNEncoder") so
reference CLI invocations carry over.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from .bigru import BiGRUEncoder
from .clip_heads import CLIPImageEncoder, CLIPTextEncoder
from .mvcnn import MVCNNEncoder
from .voxel_cnn import VoxelCNNEncoder

# Canonical feature-dict ordering; matters because the loss sums over
# pairwise combinations in dict order (reference tricolo_net.py:56-65 uses
# insertion order text → image → voxel).
FEATURE_KEYS = ("text_features", "image_features", "voxel_features")

_VOXEL_ALIASES = {"VoxelCNNEncoder", "SparseCNNEncoder"}


class TriCoLoNet(nn.Module):
    """Joint embedding model over up to three modalities.

    Constructed from a config node via `from_config`; the flax module only
    keeps the concrete hyperparameters so it stays hashable/jit-stable.
    """

    text_encoder: str = "BiGRUEncoder"
    image_encoder: str | None = None
    voxel_encoder: str | None = None
    out_dim: int = 512
    # BiGRU
    vocab_size: int = 3588
    embed_dim: int = 256
    gru_hidden_dim: int = 128
    # MVCNN
    num_views: int = 6
    z_dim: int = 512
    cnn_name: str = "resnet18"
    image_hybrid_stem: bool = False
    image_s2d_stem: bool = False
    # VoxelCNN
    voxel_size: int = 64
    ef_dim: int = 32
    voxel_z_dim: int = 512
    voxel_fused_bn_pool: bool | None = None
    voxel_masked_bn: bool = False
    voxel_tile_sparse: bool = False
    voxel_tile_sparse_blocks: int = 2
    voxel_tile_budget_frac: float = 0.5
    # Tile→grid handoff layout (None = ops/tile_sparse module default).
    voxel_scatter_layout: str | None = None
    # Opt-in explicit input-gradient conv for the VALID tile-row convs
    # (ops/conv3d.py).
    voxel_explicit_dgrad: bool = False
    # Rematerialize the voxel stack in backward (precision.remat_voxel):
    # the 128³ memory plan — block-1 activations are (B,128³,32), 8× the
    # 64³ footprint, and recomputing them beats spilling at that size
    # (neutral at 64³, PERF.md "Remat").
    voxel_remat: bool = False
    # CLIP heads
    clip_feature_dim: int = 768
    clip_dropout: float = 0.1
    clip_image_dropout: float = 0.1
    # precision
    dtype: Any = None
    param_dtype: Any = None

    @classmethod
    def from_config(cls, cfg) -> "TriCoLoNet":
        import jax.numpy as jnp

        modules = cfg.model.modules
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.precision.compute_dtype
        ]
        param_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.precision.param_dtype
        ]
        return cls(
            text_encoder=cfg.model.text_encoder or "BiGRUEncoder",
            image_encoder=cfg.model.image_encoder,
            voxel_encoder=cfg.model.voxel_encoder,
            out_dim=cfg.model.out_dim,
            vocab_size=modules.BiGRUEncoder.vocab_size,
            embed_dim=modules.BiGRUEncoder.embed_dim,
            gru_hidden_dim=modules.BiGRUEncoder.hidden_dim,
            num_views=modules.MVCNNEncoder.num_views,
            z_dim=modules.MVCNNEncoder.z_dim,
            cnn_name=modules.MVCNNEncoder.cnn_name,
            image_hybrid_stem=bool(modules.MVCNNEncoder.get("hybrid_stem", False)),
            image_s2d_stem=bool(modules.MVCNNEncoder.get("s2d_stem", False)),
            voxel_size=modules.VoxelCNNEncoder.voxel_size,
            ef_dim=modules.VoxelCNNEncoder.ef_dim,
            voxel_z_dim=modules.VoxelCNNEncoder.get("z_dim", modules.MVCNNEncoder.z_dim),
            voxel_fused_bn_pool={"auto": None, None: None, True: True, False: False}[
                modules.VoxelCNNEncoder.get("fused_bn_pool", "auto")
            ],
            voxel_masked_bn=bool(modules.VoxelCNNEncoder.get("masked_bn", False)),
            voxel_tile_sparse=bool(modules.VoxelCNNEncoder.get("tile_sparse", False)),
            voxel_tile_sparse_blocks=int(
                modules.VoxelCNNEncoder.get("tile_sparse_blocks", 2)
            ),
            voxel_tile_budget_frac=float(
                modules.VoxelCNNEncoder.get("tile_budget_frac", 0.5)
            ),
            voxel_scatter_layout=modules.VoxelCNNEncoder.get(
                "scatter_layout", None
            ),
            voxel_explicit_dgrad=bool(
                modules.VoxelCNNEncoder.get("explicit_dgrad", False)
            ),
            voxel_remat=bool(cfg.precision.get("remat_voxel", False)),
            clip_feature_dim=modules.clip_feature_dim,
            clip_dropout=modules.CLIPTextEncoder.dropout,
            clip_image_dropout=modules.CLIPImageEncoder.get(
                "dropout", modules.CLIPTextEncoder.dropout
            ),
            dtype=dtype,
            param_dtype=param_dtype,
        )

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        deterministic = not train
        output = {}

        if self.text_encoder not in ("CLIPTextEncoder", "BiGRUEncoder"):
            raise ValueError(f"unknown text encoder: {self.text_encoder}")
        if self.text_encoder == "CLIPTextEncoder":
            output["text_features"] = CLIPTextEncoder(
                out_dim=self.out_dim, feature_dim=self.clip_feature_dim,
                dropout=self.clip_dropout, dtype=self.dtype,
                param_dtype=self.param_dtype or jax.numpy.float32, name="text_encoder",
            )(batch["clip_embeddings_text"], deterministic=deterministic)
        else:
            output["text_features"] = BiGRUEncoder(
                vocab_size=self.vocab_size, out_dim=self.out_dim,
                embed_dim=self.embed_dim, hidden_dim=self.gru_hidden_dim,
                dtype=self.dtype, param_dtype=self.param_dtype or jax.numpy.float32,
                name="text_encoder",
            )(batch["tokens"], deterministic=deterministic)

        if self.image_encoder == "CLIPImageEncoder":
            output["image_features"] = CLIPImageEncoder(
                out_dim=self.out_dim, num_views=self.num_views,
                feature_dim=self.clip_feature_dim, dropout=self.clip_image_dropout,
                dtype=self.dtype, param_dtype=self.param_dtype or jax.numpy.float32,
                name="image_encoder",
            )(batch["clip_embeddings_img"], deterministic=deterministic)
        elif self.image_encoder == "MVCNNEncoder":
            output["image_features"] = MVCNNEncoder(
                num_views=self.num_views, z_dim=self.z_dim, out_dim=self.out_dim,
                cnn_name=self.cnn_name, dtype=self.dtype,
                hybrid_stem=self.image_hybrid_stem,
                s2d_stem=self.image_s2d_stem,
                param_dtype=self.param_dtype or jax.numpy.float32, name="image_encoder",
            )(batch["images"], train=train, deterministic=deterministic)
        elif self.image_encoder is not None:
            raise ValueError(f"unknown image encoder: {self.image_encoder}")

        if self.voxel_encoder in _VOXEL_ALIASES:
            # remat wraps the class (same variable tree, so checkpoints are
            # interchangeable); train/deterministic pass positionally to
            # satisfy static_argnums.
            enc_cls = (
                nn.remat(VoxelCNNEncoder, static_argnums=(2, 3))
                if self.voxel_remat
                else VoxelCNNEncoder
            )
            enc = enc_cls(
                voxel_size=self.voxel_size, ef_dim=self.ef_dim, z_dim=self.voxel_z_dim,
                out_dim=self.out_dim, dtype=self.dtype,
                param_dtype=self.param_dtype or jax.numpy.float32,
                fused_bn_pool=self.voxel_fused_bn_pool,
                masked_bn=self.voxel_masked_bn,
                tile_sparse=self.voxel_tile_sparse,
                tile_sparse_blocks=self.voxel_tile_sparse_blocks,
                tile_budget_frac=self.voxel_tile_budget_frac,
                scatter_layout=self.voxel_scatter_layout,
                explicit_dgrad=self.voxel_explicit_dgrad,
                name="voxel_encoder",
            )
            if "voxel_windows" in batch:
                # data.voxel_transfer=windowed: host-windowed tile rows
                output["voxel_features"] = enc(
                    None, train, deterministic,
                    batch["voxel_windows"], batch["voxel_tile_occ"],
                )
            elif "voxel_rows" in batch:
                # data.voxel_transfer=windowed_compact: per-sample host-
                # compacted active rows (B, k, s³) + local tile ids (B, k)
                output["voxel_features"] = enc(
                    None, train, deterministic,
                    batch["voxel_rows"], None, batch["voxel_row_ids"],
                )
            else:
                output["voxel_features"] = enc(batch["voxels"], train, deterministic)
        elif self.voxel_encoder is not None:
            raise ValueError(f"unknown voxel encoder: {self.voxel_encoder}")

        return output
