"""clean_pvnet_tpu — a TPU-native 6DoF pose-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zju3dv/clean-pvnet (PVNet, CVPR 2019): pixel-wise voting networks for 6DoF
object pose estimation, with the full post-network decode — RANSAC keypoint
voting, covariance estimation, (uncertainty-weighted) PnP, and pose metrics —
running as fixed-shape, batched, jittable code on TPU.

Layer map (mirrors reference layers, see /root/repo/SURVEY.md §1):
  geometry/  pure-function pose & projection math        (ref lib/utils/pvnet)
  ops/       voting / PnP / NN-query / rasterizer kernels (ref lib/csrc)
  models/    flax network definitions                     (ref lib/networks)
  data/      host-side datasets, augmentation, loaders    (ref lib/datasets)
  train/     train step, optimizer, checkpointing         (ref lib/train)
  eval/      evaluators and metrics                       (ref lib/evaluators)
  parallel/  mesh / sharding layer (SPMD over pod slices) (ref: nn.DataParallel)
  vis/       visualization                                (ref lib/visualizers)
"""

__version__ = "0.1.0"

from clean_pvnet_tpu.config import Config, load_config  # noqa: F401
