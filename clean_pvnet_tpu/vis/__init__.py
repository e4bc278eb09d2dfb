from clean_pvnet_tpu.vis.pvnet import PVNetVisualizer  # noqa: F401
from clean_pvnet_tpu.registry import VISUALIZERS  # noqa: F401


def make_visualizer(cfg, **kw):
    """Factory counterpart of reference lib/visualizers/make_visualizer.py:6-11."""
    return VISUALIZERS.build(cfg.task, cfg, **kw)
