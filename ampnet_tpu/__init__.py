"""ampnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud semantic-segmentation
framework with the capabilities of marionacaros/3D-semantic-segmentation-AMP-Net.

The reference is a single-device PyTorch research codebase (see /root/repo/SURVEY.md).
This framework re-designs it TPU-first:

* arbitrary-size ALS point clouds are tiled into fixed-size windows (balanced k-means),
* every window is encoded by a shared PointNet in ONE batched ``[b*W, N, C]`` pass
  (the reference loops windows in Python — reference
  ``pointNet/self-attention/train_pointnet-attention.py:396-424``),
* cross-window context flows through masked multi-head attention over the per-window
  global tokens (reference ``pointNet/model/pointnetAtt.py:154-209``),
* everything is static-shape, mask-aware, and jit-compiled; multi-chip scaling is
  expressed with ``jax.sharding.Mesh`` + data-parallel sharding over the batch axis.

Subpackages
-----------
core      typed config, PRNG discipline, checkpointing, metrics
ops       device-side point-cloud ops (augment, sampling/FPS, balanced k-means, HAG,
          window splitting) + Pallas kernels
data      canonical 13-column schema, label remapping, datasets, batching pipeline
models    Flax modules: T-Nets, PointNet encoders, attention/GRU context, seg/cls heads
parallel  mesh construction and sharded train/eval steps
train     losses, optimizers/schedules, the jitted train step and epoch driver
infer     arbitrary-scale tiled inference with stitched per-point predictions
cli       command-line entry points (preprocess / train / test / infer)
"""

__version__ = "0.1.0"
