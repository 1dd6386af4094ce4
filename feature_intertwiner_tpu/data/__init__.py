from .coco_dataset import CocoDetectionDataset, Dataset, get_data  # noqa: F401
from .loader import PrefetchLoader  # noqa: F401
