from clean_pvnet_tpu.eval.metrics import (  # noqa: F401
    add_error,
    adds_error,
    cm_degree,
    projection_2d_error,
    mask_iou,
)
from clean_pvnet_tpu.eval.linemod import LinemodEvaluator  # noqa: F401
from clean_pvnet_tpu.eval.pipeline import InferencePipeline  # noqa: F401
from clean_pvnet_tpu.eval import sixd  # noqa: F401
from clean_pvnet_tpu.eval.tless import (  # noqa: F401
    TlessEvaluator,
    detection_ap,
    detection_map,
)
from clean_pvnet_tpu.eval.vsd import (  # noqa: F401
    cou_pose_error,
    vsd_error,
    vsd_pose_error,
)
from clean_pvnet_tpu.eval.icp import ICPRefiner  # noqa: F401
from clean_pvnet_tpu.registry import EVALUATORS  # noqa: F401


def make_evaluator(cfg, **kw):
    """Factory counterpart of reference lib/evaluators/make_evaluator.py:6-19."""
    return EVALUATORS.build(cfg.task, cfg, **kw)
