"""Explicit dataclass configuration.

Replaces the reference's import-time yacs singleton (reference
lib/config/config.py:6-159) with immutable dataclasses passed through call
graphs.  Precedence: CLI dotted overrides > YAML file > dataclass defaults,
matching the reference's merge order (reference lib/config/config.py:141-147)
without the global mutable state.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping, Sequence

import yaml


def _replace_nested(obj: Any, path: Sequence[str], value: Any) -> Any:
    """Immutably set a dotted field path on nested dataclasses."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    if not hasattr(obj, head):
        raise KeyError(f"unknown config key {head!r} on {type(obj).__name__}")
    cur = getattr(obj, head)
    new = _replace_nested(cur, rest, value)
    if not rest and cur is not None and not isinstance(cur, (dict, list)):
        want = type(cur)
        if isinstance(cur, bool):
            new = bool(new)
        elif isinstance(cur, float) and not isinstance(new, float):
            new = float(new)
        elif isinstance(cur, int) and isinstance(new, float) and new == int(new):
            new = int(new)
        elif isinstance(cur, tuple) and isinstance(new, list):
            new = tuple(new)
        elif not isinstance(new, want) and want not in (type(None),):
            try:
                new = want(new)
            except Exception:
                pass
    return dataclasses.replace(obj, **{head: new})


@dataclass(frozen=True)
class NetworkConfig:
    """Architecture of the pose network (ref lib/config/config.py:14-21,108-112)."""

    name: str = "res18"           # res18 | dla34 | hourglass
    task: str = "pvnet"           # pvnet | ct | ct_pvnet
    seg_dim: int = 2
    num_keypoints: int = 9        # 8 FPS points + center
    fc_dim: int = 256
    s8_dim: int = 128
    s4_dim: int = 64
    s2_dim: int = 32
    raw_dim: int = 32
    # CenterNet detector heads (ref lib/config/config.py:111)
    ct_num_classes: int = 30
    ct_head_conv: int = 256
    use_bfloat16: bool = True     # bf16 activations/compute, fp32 params
    bn_momentum: float = 0.9
    sync_bn: bool = False         # cross-replica batch-norm stats

    @property
    def vote_dim(self) -> int:
        return 2 * self.num_keypoints


@dataclass(frozen=True)
class VotingConfig:
    """RANSAC voting decode (ref lib/csrc/ransac_voting/ransac_voting_gpu.py:112-274).

    All sizes are static so the decode jits to a single fixed-shape program.
    """

    num_hypotheses: int = 128     # per round (ref round_hyp_num)
    num_rounds: int = 1           # static bound on adaptive rounds (ref max_iter=20)
    inlier_thresh: float = 0.99   # cos-angle threshold
    confidence: float = 0.99      # while_loop early-exit: stop once every
    #                               keypoint has 1-(1-r²)^N > confidence
    #                               (ref ransac_voting_gpu.py:168-171)
    max_pixels: int = 128         # fixed pixel budget (ref max_num=100, dynamic)
    min_pixels: int = 5           # below this the vote is skipped (ref min_num)
    weighted_fg: bool = False     # seg-confidence-weighted pixel sampling
    #                               (Efraimidis-Spirakis keys; beyond-reference)
    # block-stratified selection: sort per-`strided_fg`-block maxima
    # instead of all H*W priorities (at most one pixel per block; spatially
    # stratified, uniform within blocks). 0 = off. The serving lever for
    # the selection stage, which is SORT-bound, not HBM-bound
    # (profile_voting_r05: 28.8 ms of a 91.7 ms decode at batch 64).
    strided_fg: int = 0
    approx_fg: bool = False       # approx_max_k pixel selection (TPU-fast;
    #                               still a uniform subset — see
    #                               ops/voting.select_foreground)
    # uncertainty path (ref decode_keypoint resnet18.py:65-76)
    un_hypotheses: int = 512
    un_max_pixels: int = 8192     # ref max_num=30000 (dynamic); static budget here
    cov_hypotheses: int = 4096    # ref min_hyp_num
    cov_pixels: int = 0           # pixel subsample for cov inlier counts
    #                               (0 = all of un_max_pixels — the
    #                               reference-equivalent covariance,
    #                               ref ransac_voting_gpu.py:202-274; the
    #                               serving/bench config opts into 2048:
    #                               counts are only hypothesis weights, so
    #                               a uniform prefix subsample is an
    #                               unbiased ratio estimate with ~2% noise
    #                               — see ops/voting.py. ADVICE r3 item 2)
    cov_inlier_thresh: float = 0.99
    cov_reuse: bool = False       # pool the vote rounds' own hypotheses +
    #                               ratios for the covariance instead of a
    #                               fresh cov_hypotheses population — skips
    #                               the two dominant un_pnp decode stages
    #                               (see ops/voting.ransac_vote_with_cov);
    #                               default off = reference-equivalent
    #                               covariance sample size
    # projective (vanishing-point) decode for truncated objects — the
    # 3-component hypothesis kernels the reference ships but never wires
    # (ref ransac_voting_kernel.cu:170-310). Keypoints outside the crop stay
    # usable; ones near infinity (|z|≈0) are masked out of PnP.
    projective: bool = False


@dataclass(frozen=True)
class PnPConfig:
    """On-device PnP solver replacing OpenCV iterative / Ceres LM
    (ref lib/utils/pvnet/pvnet_pose_utils.py:5-38,
     ref lib/csrc/uncertainty_pnp/src/uncertainty_pnp.cpp:61-92)."""

    lm_iters: int = 30
    lm_lambda_init: float = 1e-3
    lm_lambda_up: float = 10.0
    lm_lambda_down: float = 0.1
    # un_pnp weight form: full 2×2 inverse-sqrt covariance (the reference's
    # uncertainty_pnp, default) vs one isotropic 1/λ_max weight per keypoint
    # (the reference's uncertainty_pnp_v2, ref un_pnp_utils.py:60-121).
    # Scalar weights drop the covariance's ORIENTATION, keeping only its
    # scale — a decode-time probe for the correlated-field cmd5 mode.
    scalar_weights: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Training recipe (ref configs/linemod.yaml, lib/config/config.py:37-74)."""

    dataset: str = "LinemodTrain"
    epochs: int = 240
    batch_size: int = 32
    optimizer: str = "adam"       # adam | radam | sgd
    lr: float = 1e-3
    weight_decay: float = 0.0
    milestones: tuple = (20, 40, 60, 80, 100, 120, 140, 160, 180, 200, 220)
    gamma: float = 0.5
    warmup: bool = False
    warmup_epochs: int = 5
    warmup_factor: float = 1.0 / 3.0
    grad_clip_value: float = 40.0  # ref trainer.py clip_grad_value_(40)
    save_every_epochs: int = 5
    eval_every_epochs: int = 5
    num_workers: int = 2
    seed: int = 0
    resume: bool = True
    # samples per epoch for generative datasets (TlessPoseTrain); 0 = the
    # dataset's natural default (counterpart of the reference's ep_iter,
    # ref lib/datasets/samplers.py:46-66 IterationBasedBatchSampler)
    epoch_size: int = 0
    # augmentation (ref lib/config/config.py:60-74)
    rotate_min: float = -30.0
    rotate_max: float = 30.0
    overlap_ratio: float = 0.8
    resize_ratio_min: float = 0.8
    resize_ratio_max: float = 1.2
    # static train shapes: multiscale buckets replacing ImageSizeBatchSampler
    # (ref lib/datasets/samplers.py:9-43); each (h, w) compiles once.
    image_buckets: tuple = ((256, 344), (384, 512), (480, 640))
    # run the full train-time augmentation (rotate/crop/resize/blur/jitter)
    # on-device inside the jitted step (data/augment_device.py) — the host
    # ships cached raw uint8 frames. For CPU-poor TPU hosts; requires a
    # single bucket equal to the source resolution.
    device_augment: bool = False
    # train-time domain randomization, on device (augment_device.py):
    # probability per sample of replacing the background with a procedural
    # family (solid/plaid/blocks/gradient), and of applying the wide
    # photometric shift (gain/cast/gamma/3x noise). Both 0 = reference
    # -equivalent augmentation family.
    bg_randomize: float = 0.0
    wide_photometric: float = 0.0
    # optional torch `.pth` to initialize from: a torchvision ImageNet
    # resnet18 state dict (backbone-only, the reference's pretrained init,
    # ref lib/networks/pvnet/resnet.py:223-232) or a full reference PVNet
    # checkpoint (detected by its resnet18_8s.* keys)
    torch_pretrain: str = ""


@dataclass(frozen=True)
class TestConfig:
    """Evaluation settings (ref lib/config/config.py:76-92)."""

    dataset: str = "LinemodTest"
    batch_size: int = 1
    epoch: int = -1
    un_pnp: bool = False
    icp: bool = False
    # render resolution for eval-time ICP depth synthesis (must match the
    # dataset's depth-map size)
    icp_render_hw: tuple = (480, 640)
    # ICP confidence gate: when > 0, eval-time ICP is SKIPPED for frames
    # whose mean voting inlier ratio is at or above this value — the decode
    # is already trustworthy there, and refining a converged pose degrades
    # it (ablation_r03.json icp_add 0.63 vs decode ADD 0.98). 0 = always
    # refine (reference behavior, ref linemod/pvnet.py:102-116).
    icp_gate_inlier: float = 0.0
    # Accept-on-improvement ICP gate: refine every frame but KEEP the
    # refined pose only when its point-to-model residual against the
    # observed depth cloud drops (eval/icp.py make_linemod_refiner).
    # Unlike icp_gate_inlier this reads the depth evidence, so it stays
    # honest where a self-consistently wrong vertex field keeps voting
    # confidence high (the appearance-shift regime; VERDICT r4 item 3).
    icp_accept_improve: bool = False
    # proportional margin for the accept-on-improvement gate: keep the
    # refined pose only when residual_refined < margin × residual_initial.
    # 1.0 = any improvement; <1 demands a substantial drop, rejecting the
    # depth-consistent-but-wrong micro-improvements ICP finds around
    # already-converged poses.
    icp_improve_margin: float = 1.0
    det_gt: bool = False
    vsd: bool = False
    vsd_tau: float = 20.0
    vsd_delta: float = 15.0
    vsd_thresh: float = 0.3


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / SPMD layout (replaces nn.DataParallel, ref trainer.py:9-12)."""

    data_axis: str = "data"
    num_devices: int = -1         # -1: all visible devices
    # hypothesis-sharding axis for the distributed voting path
    hyp_axis: str = "hyp"
    hyp_shards: int = 1


@dataclass(frozen=True)
class Config:
    task: str = "pvnet"
    model: str = "pvnet_linemod"  # experiment name → model_dir/<model>
    cls_type: str = "cat"
    # Force a JAX platform ("cpu" / "tpu" / ""=default). Entry points apply
    # this via jax.config before first backend use — needed on hosts whose
    # sitecustomize registers an accelerator plugin unconditionally, where
    # the JAX_PLATFORMS env var alone is not honored.
    platform: str = ""
    model_dir: str = "data/model"
    record_dir: str = "data/record"
    result_dir: str = "data/result"
    data_root: str = "data"
    network: NetworkConfig = field(default_factory=NetworkConfig)
    voting: VotingConfig = field(default_factory=VotingConfig)
    pnp: PnPConfig = field(default_factory=PnPConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **updates: Any) -> "Config":
        return dataclasses.replace(self, **updates)

    def with_overrides(self, overrides: Mapping[str, Any]) -> "Config":
        cfg = self
        for key, value in overrides.items():
            cfg = _replace_nested(cfg, key.split("."), value)
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)


def _flatten(prefix: str, node: Any) -> dict:
    out = {}
    if isinstance(node, Mapping):
        for k, v in node.items():
            out.update(_flatten(f"{prefix}{k}.", v))
    else:
        out[prefix[:-1]] = node
    return out


def load_config(
    yaml_path: str | Path | None = None,
    overrides: Sequence[str] | Mapping[str, Any] | None = None,
) -> Config:
    """Build a Config: defaults ← YAML file ← dotted overrides.

    `overrides` accepts a mapping {"train.lr": 3e-4} or a flat CLI-style list
    ["train.lr", "3e-4", ...] mirroring the reference's `opts` pairs
    (ref lib/config/config.py:141-147).
    """
    cfg = Config()
    if yaml_path is not None:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = cfg.with_overrides(_flatten("", data))
    if overrides:
        if not isinstance(overrides, Mapping):
            if len(overrides) % 2 != 0:
                raise ValueError("override list must be key value pairs")
            pairs = {}
            for k, v in zip(overrides[::2], overrides[1::2]):
                try:
                    v = yaml.safe_load(v)
                except Exception:
                    pass
                pairs[k] = v
            overrides = pairs
        cfg = cfg.with_overrides(overrides)
    return cfg
