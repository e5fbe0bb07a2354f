from .loss import Loss
from .ctc_loss import CTCLoss
from .sequence_loss import (BasicSequenceLoss, CrossEntropyWithSmoothing,
                            PaddedCrossEntropyLossWithSmoothing,
                            BasicSampledSequenceLoss)
from .cross_entropy_loss import CrossEntropyLoss
from .text2speech_loss import Text2SpeechLoss
from .wavenet_loss import WavenetLoss
from .jca_loss import MultiTaskCTCEntropyLoss
from .transducer_loss import TransducerLoss
