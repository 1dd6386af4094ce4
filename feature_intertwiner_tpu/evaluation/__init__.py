from .coco import COCO  # noqa: F401
from .cocoeval import COCOeval  # noqa: F401
