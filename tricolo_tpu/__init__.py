"""TriCoLo-TPU: a TPU-native trimodal contrastive text-to-shape retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
3dlg-hcvc/tricolo ("TriCoLo: Trimodal Contrastive Loss for Text to Shape
Retrieval"). Trains a joint embedding space between natural-language captions
and 3D shapes via three modality encoders:

- text: bidirectional GRU (``lax.scan``) or a frozen-CLIP MLP head,
- multi-view images: view-folded ResNet backbone with max view-pooling,
- voxels: dense 3D CNN over occupancy-RGB grids (the TPU-idiomatic
  replacement for the reference's submanifold sparse CUDA convolutions).

Scaling is expressed through ``jax.sharding.Mesh`` + pjit: batches shard over
the data-parallel mesh axis and the NT-Xent loss contracts over the *global*
batch, so XLA inserts the ICI all-gathers needed for global negatives
automatically.

Reference behavior citations throughout this package point into the upstream
repository layout (e.g. ``tricolo/model/tricolo_net.py:46-54``) and describe
observed semantics only; all code here is written TPU-first from scratch.
"""

__version__ = "0.1.0"
