from motionrag_tpu.data.video_io import VideoInfo, read_video, write_video

__all__ = ["VideoInfo", "read_video", "write_video"]
