from .re10k import RealEstate10KPoseProcessor
from .video import VideoData, save_video, save_frames
