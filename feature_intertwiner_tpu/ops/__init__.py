from . import boxes, anchors  # noqa: F401
