from .frame_asr import FrameASR
