"""magicmirror — a TPU-native (JAX / XLA / Pallas / pjit) rebuild of 3D Magic Mirror.

A from-scratch framework with the capabilities of layumi/3D-Magic-Mirror
("3D Magic Mirror: Clothing Reconstruction from a Single Image via a Causal
Perspective"): single-image → disentangled camera / shape-deformation /
UV-texture / SH-lighting attributes, re-rendered through a soft (DIB-R style)
differentiable rasterizer.

The compute path is pure JAX (jit/pjit + Pallas TPU kernels); there is no CUDA
and no torch dependency in the training/inference path.

Layout (see SURVEY.md §7):
  geometry/  OBJ I/O, mesh topology, camera math
  ops/       grid-sample, SH shading, the soft rasterizer (XLA + Pallas)
  render/    DiffRender: the differentiable render pipeline + its loss suite
  models/    Flax encoders (camera/shape/texture/light/bg) + discriminators
  losses/    recon / regularizer / GAN losses
  data/      CUB / Market / ATR / ATR2 / THuman2 loaders + prep tools
  train/     jitted train step, trainer loop, EM template update, SWA, ckpts
  eval/      SSIM / mask-IoU / FID metrics, reports, gif sweeps
  dist/      device-mesh + sharding rules (DP over ICI)
  cli/       reference-compatible entry points (train.py, test.py, ...)
  configs/   the ~70-flag argparse surface + opts.yaml round-trip
"""

__version__ = "0.1.0"
