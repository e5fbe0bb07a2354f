from .frame_asr import FrameASR
from .lm_rescorer import NeuralRescorer
