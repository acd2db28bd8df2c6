from motionrag_tpu.models.encoders.vit import VisionTransformer
from motionrag_tpu.models.encoders.condition import (
    VideoMAEEmbedder,
    DINOImageEmbedder,
    CLIPImageEmbedder,
)

__all__ = [
    "VisionTransformer",
    "VideoMAEEmbedder",
    "DINOImageEmbedder",
    "CLIPImageEmbedder",
]
