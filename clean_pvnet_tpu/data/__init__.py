from clean_pvnet_tpu.data.coco import CocoIndex  # noqa: F401
from clean_pvnet_tpu.data.catalog import DatasetCatalog  # noqa: F401
import clean_pvnet_tpu.data.detection  # noqa: F401
import clean_pvnet_tpu.data.tless_pose  # noqa: F401
from clean_pvnet_tpu.data.linemod import LinemodDataset  # noqa: F401
from clean_pvnet_tpu.data.loader import DataLoader, make_data_loader  # noqa: F401
from clean_pvnet_tpu.registry import DATASETS  # noqa: F401
