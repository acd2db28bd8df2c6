from motionrag_tpu.data.video_io import VideoInfo, read_video, write_video
from motionrag_tpu.data.dataset import (
    VideoDataset,
    SkillImageDataset,
    collate_fn,
    skill_collate_fn,
)
from motionrag_tpu.data.datamodule import VideoDataModule
from motionrag_tpu.data.loader import DataLoader

__all__ = [
    "VideoInfo",
    "read_video",
    "write_video",
    "VideoDataset",
    "SkillImageDataset",
    "collate_fn",
    "skill_collate_fn",
    "VideoDataModule",
    "DataLoader",
]
