from motionrag_tpu.metrics.frechet import FrechetVideoDistance, FrechetImageDistance
from motionrag_tpu.metrics.action import ActionScore, I3DActionScore, MAEActionScore
from motionrag_tpu.metrics.dino import DINOScore
from motionrag_tpu.metrics.clip_score import CLIPScore
from motionrag_tpu.metrics.motion import MotionDistance
from motionrag_tpu.metrics.callbacks import MetricLogger, SamplewiseWrapper, SaveSampleMetrics

__all__ = [
    "FrechetVideoDistance",
    "FrechetImageDistance",
    "ActionScore",
    "I3DActionScore",
    "MAEActionScore",
    "DINOScore",
    "CLIPScore",
    "MotionDistance",
    "MetricLogger",
    "SamplewiseWrapper",
    "SaveSampleMetrics",
]
