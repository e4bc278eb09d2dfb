from clean_pvnet_tpu.models.pvnet import PVNet, build_pvnet, decode_keypoints  # noqa: F401
from clean_pvnet_tpu.models.resnet import ResNetStride8  # noqa: F401
from clean_pvnet_tpu.models.centernet import CenterNet, decode_ct_heatmap  # noqa: F401
from clean_pvnet_tpu.models.cascade import CascadePipeline  # noqa: F401
from clean_pvnet_tpu.models.dla import DLASeg  # noqa: F401
import clean_pvnet_tpu.models.hourglass  # noqa: F401
import clean_pvnet_tpu.models.linear_model  # noqa: F401
import clean_pvnet_tpu.models.resnet_dcn  # noqa: F401
from clean_pvnet_tpu.registry import NETWORKS  # noqa: F401


def make_network(cfg):
    """Factory counterpart of reference lib/networks/make_network.py:31-34,
    resolving from the explicit registry instead of imp.load_source."""
    return NETWORKS.build(cfg.network.name, cfg)
