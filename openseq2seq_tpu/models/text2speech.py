"""Text-to-speech task model (reference
`open_seq2seq/models/text2speech.py:201-558` + task subclasses):
spectrogram losses on eval, Griffin-Lim waveform reconstruction, wav
saving on eval/infer."""
from __future__ import annotations

import os

import numpy as np

from .encoder_decoder import EncoderDecoderModel
from ..data.text2speech.speech_utils import griffin_lim, inverse_mel
from ..utils.logging import deco_print


class Text2Speech(EncoderDecoderModel):

    def _create_encoder(self):
        enc_cls = self._params["encoder"]
        accepts = {**enc_cls.get_required_params(),
                   **enc_cls.get_optional_params()}
        self._params.setdefault("encoder_params", {})
        if "src_vocab_size" in accepts:
            self._params["encoder_params"].setdefault(
                "src_vocab_size",
                self.get_data_layer().params["src_vocab_size"])
        return super()._create_encoder()

    def _create_decoder(self):
        dec_cls = self._params["decoder"]
        accepts = {**dec_cls.get_required_params(),
                   **dec_cls.get_optional_params()}
        dl_params = self.get_data_layer().params
        self._params.setdefault("decoder_params", {})
        if "num_audio_features" in accepts:
            self._params["decoder_params"].setdefault(
                "num_audio_features", dl_params["num_output_features"])
        return super()._create_decoder()

    def compute_loss(self, outputs, batch):
        input_dict = {
            "decoder_output": outputs["decoder_output"],
            "target_tensors": batch["target_tensors"],
        }
        return self._loss_computator.compute_loss(input_dict)

    # ------------------------------------------------------------------
    def evaluate(self, input_values, output_values):
        valid = int(input_values.get(
            "batch_valid", input_values["source_tensors"][0].shape[0]))
        loss = float(output_values.get("loss", 0.0))
        # attention sharpness: mean max alignment (host-side diagnostic)
        dec = output_values["outputs"]["decoder_output"]
        align = np.asarray(dec["alignments"])[:valid]
        sharpness = float(np.mean(np.max(align, axis=-1)))
        spec, spec_lens = dec["outputs"]
        n = int(np.asarray(spec_lens)[0])
        first_spec = np.asarray(spec)[0, :max(n, 1)]
        return (loss * valid, valid, sharpness, align[0], first_spec)

    def finalize_evaluation(self, results_per_batch, training_step=None):
        total_loss = sum(r[0] for r in results_per_batch)
        total = sum(r[1] for r in results_per_batch)
        sharp = np.mean([r[2] for r in results_per_batch])
        eval_loss = total_loss / max(total, 1)
        deco_print("Validation loss: {:.4f} (attention sharpness "
                   "{:.3f})".format(eval_loss, sharp), offset=4)
        metrics = {"eval_loss": eval_loss,
                   "attention_sharpness": float(sharp)}
        # attention-alignment plot (reference logs these as image
        # summaries, `models/text2speech.py:19-109`)
        first = next((r[3] for r in results_per_batch
                      if len(r) > 3 and r[3] is not None), None)
        if first is not None:
            try:
                from ..utils.tb_writer import plot_to_png
                metrics["image/attention_alignment"] = plot_to_png(
                    first.T, xlabel="decoder step",
                    ylabel="encoder step")
            except Exception:
                pass
        # Griffin-Lim synthesis of the first eval sample as an audio
        # summary (the reference's tf.summary.audio in
        # `models/text2speech.py:19-109`)
        first_spec = next((r[4] for r in results_per_batch
                           if len(r) > 4 and r[4] is not None), None)
        if first_spec is not None and first_spec.shape[0] > 1:
            try:
                wav = self.synthesize_wav(first_spec)
                peak = float(np.max(np.abs(wav))) or 1.0
                sr = self.get_data_layer().params.get("sample_freq", 22050)
                metrics["audio/synthesized"] = (wav / peak * 0.9, sr)
            except Exception:
                pass
        return metrics

    # ------------------------------------------------------------------
    def synthesize_wav(self, spec: np.ndarray) -> np.ndarray:
        """log spectrogram (T, F) -> waveform via Griffin-Lim (reference
        `models/text2speech.py:182-199`)."""
        dl = self.get_data_layer()
        p = dl.params
        n_fft = p.get("n_fft", 1024)
        sr = p.get("sample_freq", 22050)
        if p["output_type"] == "mel" or (p["output_type"] == "both"):
            num_mels = (dl.n_feats["mel"] if isinstance(dl.n_feats, dict)
                        else p["num_audio_features"])
            mag = inverse_mel(
                spec, sr, n_fft, num_mels,
                mag_power=p.get("mag_power", 1),
                feature_normalize=p["feature_normalize"],
                mean=p.get("feature_normalize_mean", 0.0),
                std=p.get("feature_normalize_std", 1.0),
                fmax=p.get("fmax"))
        else:
            mag_log = spec
            if p["feature_normalize"]:
                mag_log = mag_log * p.get("feature_normalize_std", 1.0) + \
                    p.get("feature_normalize_mean", 0.0)
            full = n_fft // 2 + 1
            if mag_log.shape[1] < full:
                pad = np.full((mag_log.shape[0], full - mag_log.shape[1]),
                              np.log(1e-5), mag_log.dtype)
                mag_log = np.concatenate([mag_log, pad], axis=1)
            mag = np.exp(mag_log) ** (1.0 / p.get("mag_power", 1))
        return griffin_lim(mag, n_fft=n_fft)

    def infer(self, input_values, output_values):
        dec = output_values["outputs"]["decoder_output"]
        spec, lengths = dec["outputs"]
        valid = int(input_values.get("batch_valid", np.shape(spec)[0]))
        ids = np.asarray(input_values["source_ids"])[:valid]
        out = []
        for i in range(valid):
            n = int(np.asarray(lengths)[i])
            out.append((int(ids[i]), np.asarray(spec)[i, :n]))
        return out

    def finalize_inference(self, results_per_batch, output_file):
        """Write one wav per example next to ``output_file``."""
        from scipy.io import wavfile
        out_dir = os.path.dirname(os.path.abspath(output_file)) or "."
        os.makedirs(out_dir, exist_ok=True)
        sr = self.get_data_layer().params.get("sample_freq", 22050)
        rows = [item for batch in results_per_batch for item in batch]
        rows.sort(key=lambda kv: kv[0])
        with open(output_file, "w") as f:
            for idx, spec in rows:
                wav = self.synthesize_wav(spec)
                wav_path = os.path.join(out_dir,
                                        "sample_{}.wav".format(idx))
                peak = np.max(np.abs(wav)) or 1.0
                wavfile.write(wav_path, sr,
                              (wav / peak * 0.9 * 32767).astype(np.int16))
                f.write("{},{}\n".format(idx, wav_path))
        deco_print("Synthesized {} wavs into {}".format(len(rows), out_dir))

    def _get_num_objects_per_step(self, batch):
        if "target_tensors" in batch:
            return int(np.sum(np.asarray(batch["target_tensors"][2])))
        return int(batch["source_tensors"][0].shape[0])


class Text2SpeechTacotron(Text2Speech):
    """Named subclass for config parity (reference
    `models/text2speech_tacotron.py`)."""


class Text2SpeechCentaur(Text2Speech):
    """Named subclass for config parity (reference
    `models/text2speech_centaur.py`): Centaur's decoder-encoder
    alignments ride the same ``alignments`` output the base evaluate()
    plots (`decoders/centaur_decoder.py` merges attention blocks)."""


class Text2SpeechWavenet(Text2Speech):
    """WaveNet vocoder task model (reference
    `models/text2speech_wavenet.py`): loss-only eval; infer emits the
    teacher-forced reconstruction, ``generate`` runs true fast-WaveNet
    autoregressive synthesis."""

    def generate(self, state, conditioning=None, n_samples=16000,
                 temperature: float = 0.0, rng=None):
        """Autoregressive synthesis with per-layer queues (see
        `encoders/wavenet_encoder.py::wavenet_generate`).

        conditioning: optional (B, T_mel, F) mel features. Returns the
        (B, n_samples) float waveform."""
        from ..encoders.wavenet_encoder import wavenet_generate
        ep = self.params["encoder_params"]
        B = conditioning.shape[0] if conditioning is not None else 1
        _, audio, _ = wavenet_generate(
            state.params["enc"]["net"], n_samples,
            blocks=ep["blocks"],
            layers_per_block=ep["layers_per_block"],
            kernel_size=ep["kernel_size"],
            quantization_channels=ep["quantization_channels"],
            conditioning=conditioning, batch_size=B,
            temperature=temperature, rng=rng)
        return np.asarray(audio)

    def _create_decoder(self):
        # encoder emits logits directly; FakeDecoder passes through
        self._params.setdefault("decoder_params", {})
        return super(Text2Speech, self)._create_decoder()

    def compute_loss(self, outputs, batch):
        return self._loss_computator.compute_loss(
            {"decoder_output": outputs["decoder_output"],
             "target_tensors": batch.get("target_tensors")})

    def evaluate(self, input_values, output_values):
        valid = int(input_values.get(
            "batch_valid", input_values["source_tensors"][0].shape[0]))
        return (float(output_values.get("loss", 0.0)) * valid, valid)

    def finalize_evaluation(self, results_per_batch, training_step=None):
        total = sum(r[0] for r in results_per_batch)
        count = sum(r[1] for r in results_per_batch)
        eval_loss = total / max(count, 1)
        deco_print("Validation loss: {:.4f}".format(eval_loss), offset=4)
        return {"eval_loss": eval_loss}

    def infer(self, input_values, output_values):
        dec = output_values["outputs"]["decoder_output"]
        audio = np.asarray(dec["outputs"][1])
        valid = int(input_values.get("batch_valid", audio.shape[0]))
        ids = np.asarray(input_values["source_ids"])[:valid]
        return [(int(ids[i]), audio[i]) for i in range(valid)]

    def finalize_inference(self, results_per_batch, output_file):
        from scipy.io import wavfile
        import os as _os
        out_dir = _os.path.dirname(_os.path.abspath(output_file)) or "."
        _os.makedirs(out_dir, exist_ok=True)
        sr = self.get_data_layer().params.get("sample_freq", 22050)
        rows = [item for b in results_per_batch for item in b]
        with open(output_file, "w") as f:
            for idx, wav in rows:
                path = _os.path.join(out_dir,
                                     "wavenet_{}.wav".format(idx))
                peak = float(np.max(np.abs(wav))) or 1.0
                wavfile.write(path, sr,
                              (wav / peak * 0.9 * 32767).astype(np.int16))
                f.write("{},{}\n".format(idx, path))
        deco_print("Synthesized {} wavs".format(len(rows)))

    def _get_num_objects_per_step(self, batch):
        return int(np.sum(np.asarray(batch["source_tensors"][1])))
