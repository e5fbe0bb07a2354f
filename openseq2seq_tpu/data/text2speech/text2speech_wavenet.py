"""WaveNet data layer (reference
`open_seq2seq/data/text2speech/text2speech_wavenet.py:12-269`): raw
audio chunks + conditioning mel features from LJSpeech-style CSVs."""
from __future__ import annotations

from typing import Any, Dict, Iterator, List

import numpy as np

from .text2speech import Text2SpeechDataLayer
from .speech_utils import get_speech_features_tts


class WavenetDataLayer(Text2SpeechDataLayer):

    @staticmethod
    def get_optional_params():
        return dict(Text2SpeechDataLayer.get_optional_params(), **{
            "num_samples": int,      # audio chunk length for training
        })

    def __init__(self, params, model, num_workers=1, worker_id=0):
        params.setdefault("output_type", "mel")
        params.setdefault("feature_normalize", False)
        super().__init__(params, model, num_workers, worker_id)
        self._params.setdefault("num_samples", 16384)

    def iterate_one_epoch(self) -> Iterator[Dict[str, Any]]:
        p = self._params
        B = p["batch_size"]
        n_samples = p["num_samples"]
        hop = p["n_fft"] // 4
        order = np.arange(len(self._rows))
        if p["shuffle"]:
            self._rng.shuffle(order)
        chunk: List = []
        for idx in order:
            row = self._rows[idx]
            try:
                from scipy.io import wavfile
                sr, signal = wavfile.read(self._wav_path(row[0]))
            except (OSError, FileNotFoundError):
                continue
            if signal.ndim > 1:
                signal = signal.mean(axis=1)
            if signal.dtype.kind == "i":
                signal = signal / np.iinfo(signal.dtype).max
            signal = signal.astype(np.float32)
            if p["mode"] == "train" and len(signal) > n_samples:
                start = self._rng.randint(0, len(signal) - n_samples)
                start = start // hop * hop   # align to mel frames
                signal = signal[start:start + n_samples]
            mel = get_speech_features_tts(
                signal, sr, n_fft=p["n_fft"],
                num_mels=(self.n_feats.get("mel") or 80),
                output_type="mel", mag_power=p["mag_power"])
            chunk.append({"idx": int(idx), "audio": signal, "mel": mel})
            if len(chunk) == B:
                yield self._collate_wavenet(chunk, B)
                chunk = []
        if chunk:
            valid = len(chunk)
            chunk += [chunk[-1]] * (B - valid)
            yield self._collate_wavenet(chunk, valid)

    def _collate_wavenet(self, chunk, valid):
        B = len(chunk)
        T = max(len(e["audio"]) for e in chunk)
        T = self.pad_to_multiple(T, 256)
        audio = np.zeros((B, T), np.float32)
        audio_len = np.zeros((B,), np.int32)
        Tm = max(e["mel"].shape[0] for e in chunk)
        F = chunk[0]["mel"].shape[1]
        mel = np.zeros((B, Tm, F), np.float32)
        ids = np.zeros((B,), np.int32)
        for i, e in enumerate(chunk):
            audio[i, :len(e["audio"])] = e["audio"]
            audio_len[i] = len(e["audio"])
            mel[i, :e["mel"].shape[0]] = e["mel"]
            ids[i] = e["idx"]
        return {"source_tensors": [audio, audio_len, mel],
                "target_tensors": [audio, audio_len],
                "source_ids": ids,
                "batch_valid": np.int32(valid)}
