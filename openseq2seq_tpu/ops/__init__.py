from .ctc import ctc_loss, ctc_greedy_decode
from .features import (get_speech_features, get_speech_features_from_file,
                       normalize_signal)
