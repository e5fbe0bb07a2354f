"""Streaming frame-by-frame ASR (reference `frame_asr.py:40-311` +
`demo_streaming_asr.py`).

Maintains a ring buffer of ``frame_len``-second audio frames with
``frame_overlap`` seconds of context on each side; every new frame is
featurized and run through the (jitted) acoustic model, and the logits
for the *central* region are appended to a stateful decoder — either the
greedy merge decoder or the native/Python streaming ``BeamDecoder``
(with optional ARPA LM).

The acoustic model is any trained Speech2Text model; the forward pass is
jitted once (fixed buffer shape → one XLA compilation, low-latency
steady state).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..models import Speech2Text
from ..ops.ctc_beam import BeamDecoder, Scorer, group_word_timestamps
from ..ops.features import get_speech_features
from ..training.trainer import restore_state

import functools


class FrameASR:

    def __init__(self, model: Speech2Text, checkpoint: Optional[str] = None,
                 sr: int = 16000, frame_len: float = 0.2,
                 frame_overlap: float = 2.4,
                 timestep_duration: float = 0.02, merge: bool = True,
                 beam_width: int = 1,
                 language_model: Optional[str] = None,
                 alpha: float = 2.8, beta: float = 1.0,
                 offset: int = 5, silence_threshold: float = 0.02,
                 comfort_noise: float = 1e-3,
                 on_device_beam: bool = False,
                 device_fusion=None, max_transcript_len: int = 400):
        """``model`` must be built in "interactive_infer" (or eval) mode;
        ``timestep_duration`` is seconds per output logit frame (feature
        hop x encoder time stride)."""
        self.model = model
        self.state = restore_state(model, checkpoint)
        self._forward = jax.jit(model.eval_step)

        dl_params = model.get_data_layer().params
        self.vocab = [dl_params["idx2char"][i]
                      for i in range(len(dl_params["idx2char"]))]
        self.sr = sr
        self.frame_len = frame_len
        self.n_frame_len = int(frame_len * sr)
        self.n_frame_overlap = int(frame_overlap * sr)
        if self.n_frame_overlap % self.n_frame_len:
            raise ValueError("'frame_overlap' should be a multiple of "
                             "'frame_len'")
        self.n_timesteps_overlap = int(round(frame_overlap /
                                             timestep_duration))
        self.n_timesteps_frame = int(round(frame_len / timestep_duration))
        self.buffer = np.zeros(2 * self.n_frame_overlap + self.n_frame_len,
                               np.float32)
        self.merge = merge
        self.offset = offset
        self.silence_threshold = silence_threshold
        # digital-zero padding featurizes to the log floor — far
        # outside anything the model saw; pad with a real noise floor
        self.comfort_noise = comfort_noise
        self._noise_rng = np.random.RandomState(0)
        self._beam_decoder = None
        self._dev_beam = None
        if beam_width > 1 and on_device_beam:
            # carry the beam state across chunks INSIDE jit — no host
            # decoder at all (ops/ctc_beam_tpu streaming API); optional
            # `device_fusion` is a ctc_beam_tpu.FusionLM
            from ..ops.ctc_beam_tpu import ctc_beam_init, ctc_beam_update
            self._dev_K = beam_width
            self._dev_U = int(max_transcript_len)
            self._dev_init = lambda: ctc_beam_init(
                1, self._dev_K, self._dev_U, device_fusion)
            self._dev_beam = jax.jit(functools.partial(
                ctc_beam_update, fusion=device_fusion))
        elif beam_width > 1:
            scorer = None
            if language_model is not None:
                scorer = Scorer(alpha, beta, language_model,
                                self.vocab)
            self._beam_decoder = BeamDecoder(self.vocab, beam_width,
                                             ext_scorer=scorer)
        self.reset()

    # ------------------------------------------------------------------
    def _noise(self, n):
        return (self._noise_rng.randn(n) *
                self.comfort_noise).astype(np.float32)

    def reset(self):
        self.buffer[:] = self._noise(len(self.buffer))
        self.text = ""
        self.prev_char = ""
        if self._beam_decoder is not None:
            self._beam_decoder.reset()
        if self._dev_beam is not None:
            self._dev_state = self._dev_init()
            self._dev_times = []

    def _featurize(self, signal: np.ndarray):
        dl_params = dict(self.model.get_data_layer().params)
        feats, _ = get_speech_features(signal, self.sr, dl_params)
        return feats

    def _run_model(self, signal: np.ndarray, extra=None):
        """Taper + featurize ``signal``, run the jitted forward; returns
        the decoder-output dict. ``extra`` merges additional keys into
        the batch (streaming decoders thread state through here)."""
        # taper the buffer edges (50 ms ramps): hard truncation of audio
        # mid-phoneme creates spectral splatter the acoustic model never
        # saw in training
        ramp = int(0.05 * self.sr)
        if len(signal) > 2 * ramp:
            signal = signal.copy()
            win = 0.5 * (1 - np.cos(np.pi * np.arange(ramp) / ramp))
            signal[:ramp] *= win
            signal[-ramp:] *= win[::-1]
        feats = self._featurize(signal)
        dl = self.model.get_data_layer()
        pad_to = max(dl.params.get("pad_to", 8), 1)
        T = dl.pad_to_multiple(feats.shape[0], pad_to)
        x = np.zeros((1, T, feats.shape[1]), np.float32)
        x[0, :feats.shape[0]] = feats
        batch = {"source_tensors": [x, np.asarray([feats.shape[0]],
                                                  np.int32)],
                 "source_ids": np.zeros((1,), np.int32),
                 "batch_valid": np.int32(1)}
        if extra:
            batch.update(extra)
        out = self._forward(self.state, batch)
        return out["outputs"]["decoder_output"]

    def _infer_logits(self, signal: np.ndarray) -> np.ndarray:
        dec_out = self._run_model(signal)
        logits = np.asarray(dec_out["logits"])[0]
        n = int(np.asarray(dec_out["src_length"])[0])
        return logits[:n]

    # ------------------------------------------------------------------
    def transcribe(self, frame: np.ndarray) -> str:
        """Feed ``frame_len`` seconds of audio; returns newly decoded
        text (greedy mode) or the full current transcript (beam mode)."""
        if len(frame) != self.n_frame_len:
            raise ValueError("frame must be exactly frame_len seconds")
        self.buffer[:-self.n_frame_len] = self.buffer[self.n_frame_len:]
        self.buffer[-self.n_frame_len:] = frame
        # energy gate: the per-buffer gain normalization amplifies noise
        # in silent regions into phantom phones — skip silent centers
        central_audio = self.buffer[self.n_frame_overlap:
                                    self.n_frame_overlap +
                                    self.n_frame_len]
        if np.sqrt(np.mean(central_audio ** 2)) < self.silence_threshold:
            self.prev_char = ""
            return ""
        logits = self._infer_logits(self.buffer)
        # keep exactly the central frame_len region so consecutive
        # windows tile without duplicates or gaps
        lo = self.n_timesteps_overlap
        central = logits[lo:lo + self.n_timesteps_frame]
        if self._dev_beam is not None:
            n = central.shape[0]
            self._dev_state, (ids, lens, _, frames) = self._dev_beam(
                self._dev_state, np.asarray(central)[None],
                np.asarray([n], np.int32))
            n_len = int(np.asarray(lens)[0, 0])
            best = np.asarray(ids)[0, 0, :n_len]
            self.text = "".join(self.vocab[int(i)] for i in best)
            self._dev_times = np.asarray(frames)[0, 0, :n_len].tolist()
            return self.text
        probs = _softmax(central)
        if self._beam_decoder is not None:
            # keep self.text tracking the decoder's current transcript so
            # flush()'s fallback can return it when every flush frame is
            # silence-gated
            self.text = self._beam_decoder.decode(probs)
            return self.text
        return self._greedy_merge_step(probs)

    def _greedy_merge_step(self, probs: np.ndarray) -> str:
        blank = probs.shape[1] - 1
        ids = np.argmax(probs, axis=1)
        out = []
        for i in ids:
            ch = "" if i == blank else self.vocab[int(i)]
            if ch and ch != self.prev_char:
                out.append(ch)
            self.prev_char = ch if i != blank else ""
        new_text = "".join(out)
        self.text += new_text
        return new_text

    def flush(self) -> str:
        """Feed silence until the tail of the audio has passed through
        the central (decoded) region. Greedy mode returns the newly
        produced text (join with what came before); beam modes return
        the FULL final transcript, matching what ``transcribe``
        returns there."""
        out = []
        frames = self.n_frame_overlap // self.n_frame_len + 1
        for _ in range(frames):
            out.append(self.transcribe(self._noise(self.n_frame_len)))
        if self._beam_decoder is not None or self._dev_beam is not None:
            full = [t for t in out if t]
            return full[-1] if full else self.text
        return "".join(out)

    def get_word_timestamps(self):
        """[(word, start_frame, end_frame)] from either beam backend:
        the stateful host decoder's per-character emission times, or —
        in on-device mode — the beam kernel's carried emission-frame
        buffer (utterance-absolute, same grouping)."""
        if self._dev_beam is not None:
            return group_word_timestamps(self.text,
                                         getattr(self, "_dev_times", []))
        if self._beam_decoder is None:
            return []
        return self._beam_decoder.get_word_timestamps()


class TransducerFrameASR(FrameASR):
    """Streaming RNN-T decoding over the same ring buffer as
    :class:`FrameASR`.

    The transducer is natively streaming: the prediction-net state
    (LSTM carry + projected activation) is threaded across chunks via
    the decoder module's ``decode_carry``/``decode_window`` hooks
    (`decoders/transducer_decoder.py`), and each encoder frame of the
    central region is consumed exactly once — so there is no CTC-style
    merge/dedup step and no duplicate emissions at window boundaries.
    The encoder still sees the full overlap context on both sides.

    ``timestep_duration`` must include the encoder time stride (e.g.
    10 ms hop x 4 Conformer subsampling = 0.04)."""

    def __init__(self, model: Speech2Text, checkpoint: Optional[str] = None,
                 **kwargs):
        for k in ("merge", "beam_width", "language_model", "alpha",
                  "beta", "offset"):
            kwargs.pop(k, None)
        super().__init__(model, checkpoint, merge=False, beam_width=1,
                         **kwargs)

    def reset(self):
        super().reset()
        self._carry = None
        self._frames_done = 0   # decoded central frames consumed so far
        self._times = []        # per-emitted-character absolute frames

    def transcribe(self, frame: np.ndarray) -> str:
        """Feed ``frame_len`` seconds of audio; returns the text newly
        emitted for the central region of the buffer."""
        if len(frame) != self.n_frame_len:
            raise ValueError("frame must be exactly frame_len seconds")
        self.buffer[:-self.n_frame_len] = self.buffer[self.n_frame_len:]
        self.buffer[-self.n_frame_len:] = frame
        central_audio = self.buffer[self.n_frame_overlap:
                                    self.n_frame_overlap +
                                    self.n_frame_len]
        if np.sqrt(np.mean(central_audio ** 2)) < self.silence_threshold:
            return ""
        lo = np.asarray([self.n_timesteps_overlap], np.int32)
        hi = lo + np.int32(self.n_timesteps_frame)
        extra = {"decode_window": (lo, hi)}
        if self._carry is not None:
            extra["decode_carry"] = self._carry
        dec_out = self._run_model(self.buffer, extra=extra)
        self._carry = jax.tree_util.tree_map(np.asarray,
                                             dec_out["decode_carry"])
        ids, n = dec_out["outputs"]
        ids = np.asarray(ids)[0]
        n = int(np.asarray(n)[0])
        new_text = "".join(self.vocab[int(i)] for i in ids[:n])
        # emission frames are buffer-relative; rebase onto the running
        # count of consumed central frames (timestamps count decoded,
        # i.e. non-silence-gated, frames — same convention as the CTC
        # streaming decoders)
        emit = np.asarray(dec_out["emit_frames"])[0, :n]
        self._times.extend(
            (self._frames_done + int(t) - int(lo[0])) for t in emit)
        self._frames_done += self.n_timesteps_frame
        self.text += new_text
        return new_text

    def get_word_timestamps(self):
        """[(word, start_frame, end_frame)] — RNN-T emissions are
        frame-synchronous, so these come straight from the decoder."""
        return group_word_timestamps(self.text, self._times)


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)
