from .coco import CocoKeypointDataset
from .evaluator import KeypointEvaluator

__all__ = ["CocoKeypointDataset", "KeypointEvaluator"]
