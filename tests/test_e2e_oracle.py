"""Composed full-model torch-oracle training-step test.

The strongest runnable substitute for the reference's README-checkpoint
regression oracle (reference README.md:122-129 can't be reproduced without
the released ckpts + dataset): build the reference's Bi(V) training step in
CPU torch — BiGRU text encoder (bigru.py:7-18) + a dense-equivalent voxel
CNN with the SparseCNNEncoder channel schedule (sparse_cnn.py:11-44) +
NT-Xent (nt_xent.py:54-74) + torch.optim.Adam (config.yaml:50-53) —
transplant the weights into our TriCoLoNet, and require the *actual
framework train step* (training/steps.make_train_step, torch-Adam optax
chain, BN stat updates) to track the torch losses step for step.

This composes every oracle-tested piece (BiGRU, Adam, NT-Xent, BN) through
the real pipeline: prepare_device_batch densify → encoders → pairwise loss →
grad → update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tricolo_tpu.config import load_config  # noqa: E402
from tricolo_tpu.data.device_prep import pack_sparse_voxels, prepare_device_batch  # noqa: E402
from tricolo_tpu.models.tricolo_net import TriCoLoNet  # noqa: E402
from tricolo_tpu.training import TrainState, make_optimizer, make_train_step  # noqa: E402

VOCAB, OUT, EF, Z = 50, 16, 4, 16
BATCH, VOX, SEQ, NPTS = 8, 32, 12, 64


class TorchBiGRU(torch.nn.Module):
    """Reference text encoder (tricolo/model/module/text_encoder/bigru.py:7-18)."""

    def __init__(self):
        super().__init__()
        self.embedding_layer = torch.nn.Embedding(VOCAB, 256, padding_idx=0)
        self.gru = torch.nn.GRU(256, 128, num_layers=1, bidirectional=True)
        self.fc = torch.nn.Linear(256, OUT)

    def forward(self, x):
        emb = torch.transpose(self.embedding_layer(x), 0, 1)
        h0 = torch.zeros(size=(2, emb.shape[1], 128), dtype=torch.float32)
        _, hidden = self.gru(emb, h0)
        out = torch.tanh(self.fc(torch.cat((hidden[-2], hidden[-1]), dim=1)))
        return F.normalize(out, dim=1)


class TorchVoxelCNN(torch.nn.Module):
    """Dense twin of the reference SparseCNNEncoder (sparse_cnn.py:11-44):
    5× [Conv3d(k=3, no bias) → BatchNorm → ReLU → MaxPool(2)] with channels
    3→ef→2ef→4ef→8ef→z, flatten, Linear→ReLU→Linear, L2-normalize."""

    def __init__(self):
        super().__init__()
        chans = [3, EF, EF * 2, EF * 4, EF * 8, Z]
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [
                torch.nn.Conv3d(cin, cout, 3, padding=1, bias=False),
                torch.nn.BatchNorm3d(cout),
                torch.nn.ReLU(),
                torch.nn.MaxPool3d(2),
            ]
        self.net = torch.nn.Sequential(*layers)
        # 32³ input through five 2× pools → 1³ spatial, so flatten == Z and
        # no NCDHW/NDHWC flatten-order permutation is needed.
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(Z, OUT), torch.nn.ReLU(), torch.nn.Linear(OUT, OUT)
        )

    def forward(self, x):
        h = self.net(x).flatten(start_dim=1)
        return F.normalize(self.mlp(h), dim=1)


def torch_nt_xent(zis, zjs, tau=0.1, alpha=0.25):
    """Reference NTXentLoss numerics (nt_xent.py:54-74)."""
    zis, zjs = F.normalize(zis, dim=1), F.normalize(zjs, dim=1)
    b = zis.shape[0]
    eye = torch.eye(b)

    def sxent(logits):
        return (-eye * F.log_softmax(logits, dim=1)).sum() / b

    loss_ab = sxent(zis @ zjs.t() / tau)
    loss_ba = sxent(zjs @ zis.t() / tau)
    return alpha * loss_ab + (1 - alpha) * loss_ba


def _host_batch(rng):
    tokens = rng.integers(1, VOCAB, (BATCH, SEQ)).astype(np.int32)
    tokens[0, 6:] = 0  # trailing padding
    flat = np.empty((BATCH, NPTS), np.uint32)
    rgb = np.empty((BATCH, NPTS), np.uint32)
    for i in range(BATCH):
        n = NPTS - 8
        sites = np.sort(rng.choice(VOX**3, size=n, replace=False))
        coords = np.stack(
            [sites // VOX**2, (sites // VOX) % VOX, sites % VOX], axis=1
        ).astype(np.uint8)
        feats = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        flat[i], rgb[i] = pack_sparse_voxels(coords, feats, NPTS)
    return {"tokens": tokens, "voxel_flat": flat, "voxel_rgb": rgb}


def _transplant(variables, tt, tv):
    params = jax.tree.map(np.array, variables["params"])
    stats = jax.tree.map(np.array, variables["batch_stats"])

    text = params["text_encoder"]
    text["Embed_0"]["embedding"] = tt.embedding_layer.weight.detach().numpy()
    for direction, sfx in (("gru_fwd", ""), ("gru_bwd", "_reverse")):
        text[direction]["w_ih"] = getattr(tt.gru, f"weight_ih_l0{sfx}").detach().numpy().T
        text[direction]["w_hh"] = getattr(tt.gru, f"weight_hh_l0{sfx}").detach().numpy().T
        text[direction]["b_ih"] = getattr(tt.gru, f"bias_ih_l0{sfx}").detach().numpy()
        text[direction]["b_hh"] = getattr(tt.gru, f"bias_hh_l0{sfx}").detach().numpy()
    text["fc"]["Dense_0"]["kernel"] = tt.fc.weight.detach().numpy().T
    text["fc"]["Dense_0"]["bias"] = tt.fc.bias.detach().numpy()

    vox = params["voxel_encoder"]
    vox_stats = stats["voxel_encoder"]
    convs = [m for m in tv.net if isinstance(m, torch.nn.Conv3d)]
    bns = [m for m in tv.net if isinstance(m, torch.nn.BatchNorm3d)]
    for i, (conv, bn) in enumerate(zip(convs, bns)):
        block = vox[f"ConvBlock_{i}"]
        kernel = conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
        if i == 0 and kernel.shape[-2] == 3:
            # The encoder zero-pads RGB input to 4 channels (exact — see
            # models/voxel_cnn.padded_rgb_conv_kernel_init); pad the
            # reference kernel to match.
            kernel = np.concatenate(
                [kernel, np.zeros_like(kernel[..., :1, :])], axis=-2
            )
        block["Conv_0"]["kernel"] = kernel
        block["BatchNorm_0"]["scale"] = bn.weight.detach().numpy()
        block["BatchNorm_0"]["bias"] = bn.bias.detach().numpy()
        sb = vox_stats[f"ConvBlock_{i}"]["BatchNorm_0"]
        sb["mean"] = bn.running_mean.detach().numpy()
        sb["var"] = bn.running_var.detach().numpy()
    mlp = vox["MLPHead_0"]
    for j, lin in enumerate(m for m in tv.mlp if isinstance(m, torch.nn.Linear)):
        dense = mlp[f"TorchLinear_{j}"]["Dense_0"]
        dense["kernel"] = lin.weight.detach().numpy().T
        dense["bias"] = lin.bias.detach().numpy()

    # jnp.array copies: .detach().numpy() above are *views* of the live torch
    # tensors and CPU-JAX asarray is zero-copy — without the copy, torch's
    # opt.step() would mutate the transplanted JAX params in place.
    return {
        "params": jax.tree.map(lambda a: jnp.array(a, copy=True), params),
        "batch_stats": jax.tree.map(lambda a: jnp.array(a, copy=True), stats),
    }


def test_biv_train_steps_match_torch():
    cfg = load_config(
        [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            f"model.out_dim={OUT}",
            f"model.modules.VoxelCNNEncoder.ef_dim={EF}",
            "model.modules.VoxelCNNEncoder.masked_bn=false",  # the oracle pins the dense path
            f"model.modules.VoxelCNNEncoder.z_dim={Z}",
            f"model.modules.MVCNNEncoder.z_dim={Z}",
            f"data.vocab_size={VOCAB}",
            f"data.voxel_size={VOX}",
            f"data.batch_size={BATCH}",
            "precision.compute_dtype=float32",
        ]
    )
    rng = np.random.default_rng(7)
    host = _host_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    torch.manual_seed(0)
    tt, tv = TorchBiGRU(), TorchVoxelCNN()

    model = TriCoLoNet.from_config(cfg)
    device_batch = prepare_device_batch(batch, VOX)
    variables = model.init(jax.random.PRNGKey(0), device_batch)
    variables = _transplant(variables, tt, tv)

    # Same dense voxels the framework step consumes, NCDHW for torch.
    dense = np.asarray(device_batch["voxels"])
    t_vox = torch.from_numpy(dense.transpose(0, 4, 1, 2, 3).copy())
    t_tok = torch.from_numpy(host["tokens"].astype(np.int64))

    lr = cfg.optimizer.lr
    opt = torch.optim.Adam(
        list(tt.parameters()) + list(tv.parameters()),
        lr=lr,
        weight_decay=cfg.optimizer.weight_decay,
        eps=1e-8,
    )

    tx = make_optimizer(cfg)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)

    tt.train(), tv.train()
    for step in range(3):
        opt.zero_grad()
        t_loss = torch_nt_xent(tt(t_tok), tv(t_vox))
        t_loss.backward()
        opt.step()

        state, losses = train_step(state, batch, lr, key)
        j_loss = float(losses["train_loss/total_loss"])
        assert abs(j_loss - float(t_loss)) < 2e-4, (
            f"step {step}: jax {j_loss} vs torch {float(t_loss)}"
        )


class TorchMaskedVoxelCNN(TorchVoxelCNN):
    """Submanifold (spconv-faithful) twin of the reference SparseCNNEncoder
    (sparse_cnn.py:11-40): dense conv over the zero-masked grid equals
    SubMConv3d at active sites (inactive inputs are zero; outputs off the
    active set are discarded), BatchNorm statistics reduce over active sites
    only (spconv's BatchNorm1d sees the (N_active, C) feature matrix),
    normalized+relu'd values are zeroed at inactive sites, and MaxPool3d over
    the resulting ≥0 grid equals the sparse pool wherever a window holds an
    active site; the mask itself pools by window-any. These are exactly the
    semantics of ops/fused_bn_pool.masked_bn_relu_pool — the flagship
    masked_bn=true default since round 3 (PARITY.md)."""

    def forward(self, x, mask):  # x: (B,3,D,D,D), mask: (B,1,D,D,D) 0/1
        h, m = x, mask
        mods = list(self.net)
        for i in range(0, len(mods), 4):
            conv, bn = mods[i], mods[i + 1]
            h = conv(h)
            count = m.sum().clamp(min=1.0)
            mean = (h * m).sum(dim=(0, 2, 3, 4)) / count
            var = ((h * h) * m).sum(dim=(0, 2, 3, 4)) / count - mean * mean
            var = var.clamp(min=0.0)
            cshape = (1, -1, 1, 1, 1)
            hhat = (h - mean.view(cshape)) * torch.rsqrt(var + bn.eps).view(cshape)
            h = torch.relu(hhat * bn.weight.view(cshape) + bn.bias.view(cshape)) * m
            h = F.max_pool3d(h, 2)
            m = F.max_pool3d(m, 2)
        return F.normalize(self.mlp(h.flatten(start_dim=1)), dim=1)


def test_biv_masked_train_steps_match_torch():
    """The FLAGSHIP voxel semantics (masked_bn=true, the config default since
    round 3) against a torch oracle implementing spconv's submanifold
    behavior directly. Together with tests/test_tile_sparse.py (windowed /
    windowed_compact / tile-sparse paths bit-exact vs dense-masked), this
    pins the entire flagship voxel compute chain to torch numerics."""
    cfg = load_config(
        [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            f"model.out_dim={OUT}",
            f"model.modules.VoxelCNNEncoder.ef_dim={EF}",
            f"model.modules.VoxelCNNEncoder.z_dim={Z}",
            f"model.modules.MVCNNEncoder.z_dim={Z}",
            f"data.vocab_size={VOCAB}",
            f"data.voxel_size={VOX}",
            f"data.batch_size={BATCH}",
            "precision.compute_dtype=float32",
        ]
    )
    assert cfg.model.modules.VoxelCNNEncoder.masked_bn is True  # the default
    rng = np.random.default_rng(13)
    host = _host_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    torch.manual_seed(0)
    tt, tv = TorchBiGRU(), TorchMaskedVoxelCNN()

    model = TriCoLoNet.from_config(cfg)
    device_batch = prepare_device_batch(batch, VOX, voxel_mask=True)
    variables = model.init(jax.random.PRNGKey(0), device_batch)
    variables = _transplant(variables, tt, tv)

    dense = np.asarray(device_batch["voxels"])  # (B, D, D, D, 4) RGB+mask
    t_vox = torch.from_numpy(dense[..., :3].transpose(0, 4, 1, 2, 3).copy())
    t_mask = torch.from_numpy(dense[..., 3:].transpose(0, 4, 1, 2, 3).copy())
    t_tok = torch.from_numpy(host["tokens"].astype(np.int64))

    lr = cfg.optimizer.lr
    opt = torch.optim.Adam(
        list(tt.parameters()) + list(tv.parameters()),
        lr=lr,
        weight_decay=cfg.optimizer.weight_decay,
        eps=1e-8,
    )
    tx = make_optimizer(cfg)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)

    tt.train(), tv.train()
    for step in range(3):
        opt.zero_grad()
        t_loss = torch_nt_xent(tt(t_tok), tv(t_vox, t_mask))
        t_loss.backward()
        opt.step()

        state, losses = train_step(state, batch, lr, key)
        j_loss = float(losses["train_loss/total_loss"])
        assert abs(j_loss - float(t_loss)) < 2e-4, (
            f"step {step}: jax {j_loss} vs torch {float(t_loss)}"
        )


class TorchMVCNN(torch.nn.Module):
    """Reference MVCNN twin (mv_cnn.py:9-33): shared ResNet18 backbone over
    the view-folded batch, element-wise max over views, fc→z_dim, MLP,
    L2-normalize. Reuses the torchvision-named backbone oracle from
    tests/test_resnet.py."""

    def __init__(self, num_views: int):
        super().__init__()
        from test_resnet import TorchResNet18

        self.num_views = num_views
        self.backbone = TorchResNet18()
        self.fc = torch.nn.Linear(512, Z)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(Z, OUT), torch.nn.ReLU(), torch.nn.Linear(OUT, OUT)
        )

    def forward(self, x):  # x: (B·V, 3, H, W) normalized floats
        feats = self.backbone(x)  # (B·V, 512)
        feats = feats.reshape(-1, self.num_views, feats.shape[-1])
        pooled = feats.max(dim=1).values
        return F.normalize(self.mlp(self.fc(pooled)), dim=1)


@pytest.mark.parametrize("masked", [False, True])
def test_tri_train_steps_match_torch(masked):
    """Full flagship Tri(I+V): BiGRU + MVCNN/ResNet18 + VoxelCNN through the
    real train step vs the composed torch reference, loss-for-loss — under
    both voxel-BN semantics: dense all-site statistics (masked=False) and
    the spconv-faithful submanifold semantics (masked=True, the config
    default — the trimodal composition of TorchMaskedVoxelCNN)."""
    VIEWS, IMG = 2, 32
    cfg = load_config(
        [
            "data=synthetic",
            "model.voxel_encoder=VoxelCNNEncoder",
            "model.image_encoder=MVCNNEncoder",
            f"model.out_dim={OUT}",
            f"model.modules.VoxelCNNEncoder.ef_dim={EF}",
            f"model.modules.VoxelCNNEncoder.masked_bn={str(masked).lower()}",
            f"model.modules.VoxelCNNEncoder.z_dim={Z}",
            f"model.modules.MVCNNEncoder.z_dim={Z}",
            f"data.vocab_size={VOCAB}",
            f"data.voxel_size={VOX}",
            f"data.batch_size={BATCH}",
            f"data.num_views={VIEWS}",
            f"data.image_size={IMG}",
            "precision.compute_dtype=float32",
        ]
    )
    rng = np.random.default_rng(11)
    host = _host_batch(rng)
    host["images"] = rng.integers(
        0, 256, (BATCH, VIEWS, IMG, IMG, 3), dtype=np.uint8
    )
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    torch.manual_seed(0)
    tt, ti = TorchBiGRU(), TorchMVCNN(VIEWS)
    tv = TorchMaskedVoxelCNN() if masked else TorchVoxelCNN()

    model = TriCoLoNet.from_config(cfg)
    device_batch = prepare_device_batch(batch, VOX, voxel_mask=masked)
    variables = model.init(jax.random.PRNGKey(0), device_batch)
    variables = _transplant(variables, tt, tv)

    # Image-encoder transplant: backbone through the torchvision-name
    # converter, then fc/MLP heads.
    from tricolo_tpu.models.resnet import convert_torchvision_state_dict

    params = jax.tree.map(np.array, variables["params"])
    stats = jax.tree.map(np.array, variables["batch_stats"])
    bb_params, bb_stats = convert_torchvision_state_dict(
        ti.backbone.state_dict(), "resnet18"
    )
    params["image_encoder"]["backbone"] = jax.tree.map(np.array, bb_params)
    stats["image_encoder"]["backbone"] = jax.tree.map(np.array, bb_stats)
    img = params["image_encoder"]
    img["fc"]["Dense_0"]["kernel"] = ti.fc.weight.detach().numpy().T
    img["fc"]["Dense_0"]["bias"] = ti.fc.bias.detach().numpy()
    for j, lin in enumerate(m for m in ti.mlp if isinstance(m, torch.nn.Linear)):
        dense = img["MLPHead_0"][f"TorchLinear_{j}"]["Dense_0"]
        dense["kernel"] = lin.weight.detach().numpy().T
        dense["bias"] = lin.bias.detach().numpy()
    variables = {
        "params": jax.tree.map(lambda a: jnp.array(a, copy=True), params),
        "batch_stats": jax.tree.map(lambda a: jnp.array(a, copy=True), stats),
    }

    dense = np.asarray(device_batch["voxels"])
    t_vox = torch.from_numpy(dense[..., :3].transpose(0, 4, 1, 2, 3).copy())
    t_mask = (
        torch.from_numpy(dense[..., 3:].transpose(0, 4, 1, 2, 3).copy())
        if masked
        else None
    )
    t_tok = torch.from_numpy(host["tokens"].astype(np.int64))
    imgs = np.asarray(device_batch["images"])  # (B, V, H, W, 3) normalized
    t_img = torch.from_numpy(
        imgs.reshape(-1, IMG, IMG, 3).transpose(0, 3, 1, 2).copy()
    )

    lr = cfg.optimizer.lr
    opt = torch.optim.Adam(
        list(tt.parameters()) + list(tv.parameters()) + list(ti.parameters()),
        lr=lr,
        weight_decay=cfg.optimizer.weight_decay,
        eps=1e-8,
    )
    tx = make_optimizer(cfg)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)

    tt.train(), tv.train(), ti.train()
    # Tolerance grows per optimizer step: 20 convs of train-mode BN plus
    # Adam's rsqrt amplify f32 accumulation-order differences compound-wise
    # (measured drift ~3e-3 by step 2 at loss ~4.9).
    tols = (5e-4, 2e-3, 8e-3)
    for step in range(3):
        opt.zero_grad()
        f_t, f_i = tt(t_tok), ti(t_img)
        f_v = tv(t_vox, t_mask) if masked else tv(t_vox)
        # Sum of pairwise losses in feature-dict order text→image→voxel
        # (reference tricolo_net.py:56-65).
        t_loss = (
            torch_nt_xent(f_t, f_i)
            + torch_nt_xent(f_t, f_v)
            + torch_nt_xent(f_i, f_v)
        )
        t_loss.backward()
        opt.step()

        state, losses = train_step(state, batch, lr, key)
        j_loss = float(losses["train_loss/total_loss"])
        assert abs(j_loss - float(t_loss)) < tols[step], (
            f"step {step}: jax {j_loss} vs torch {float(t_loss)}"
        )
