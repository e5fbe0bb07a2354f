"""Speech-to-text task model: WER metrics, infer CSV output
(reference `open_seq2seq/models/speech2text.py:98-360`)."""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from .encoder_decoder import EncoderDecoderModel
from ..utils.logging import deco_print
from ..utils.metrics import levenshtein


class Speech2Text(EncoderDecoderModel):

    def _create_decoder(self):
        # vocab size flows from the data layer (reference
        # `models/speech2text.py:102-106`)
        self._params.setdefault("decoder_params", {})
        self._params["decoder_params"]["tgt_vocab_size"] = \
            self.get_data_layer().params["tgt_vocab_size"]
        return super()._create_decoder()

    def build_module(self):
        base = super().build_module()
        dlp = self.get_data_layer().params
        if not dlp.get("featurize_on_device", False):
            return base

        # on-device featurization (VERDICT r1 #4 / BASELINE north star):
        # the data layer feeds padded raw-audio batches; the log-mel
        # front end runs inside the jitted step (XLA TPU FFT + one MXU
        # filterbank matmul, `ops/features_jax.py`), replacing the
        # reference's host tf.py_func featurizer
        # (`docs/speech-commands.rst:28`).
        import math

        import flax.linen as nn

        from ..ops.features_jax import logmel_features

        sr = int(dlp.get("sample_freq", 16000))
        win = int(dlp.get("window_size", 20e-3) * sr)
        hop = int(dlp.get("window_stride", 10e-3) * sr)
        n_fft = int(dlp.get("num_fft", 0) or 2 ** math.ceil(
            math.log2(dlp.get("window_size", 20e-3) * sr)))
        num_features = int(dlp["num_audio_features"])
        # host default is norm_per_feature=False (`ops/features.py:164`)
        norm_pf = bool(dlp.get("norm_per_feature", False))

        class DeviceFeaturizedForward(nn.Module):
            inner: nn.Module

            @nn.compact
            def __call__(self, batch: Dict[str, Any], train: bool):
                audio, audio_len = batch["source_tensors"]
                feats, feat_len = logmel_features(
                    audio, audio_len, sample_freq=sr,
                    num_features=num_features, n_fft=n_fft,
                    hop_length=hop, win_length=win,
                    norm_per_feature=norm_pf)
                new_batch = dict(batch)
                new_batch["source_tensors"] = [feats, feat_len]
                return self.inner(new_batch, train)

        return DeviceFeaturizedForward(inner=base)

    def _create_loss(self):
        loss_cls = self._params.get("loss")
        if loss_cls is not None:
            accepts = {**loss_cls.get_required_params(),
                       **loss_cls.get_optional_params()}
            self._params.setdefault("loss_params", {})
            dl_params = self.get_data_layer().params
            if "tgt_vocab_size" in accepts:
                self._params["loss_params"].setdefault(
                    "tgt_vocab_size", dl_params["tgt_vocab_size"])
            if "batch_size" in accepts:
                self._params["loss_params"].setdefault(
                    "batch_size", dl_params["batch_size"])
        return super()._create_loss()

    def _decode_batch(self, output_values) -> List[str]:
        """Decoded ids (B, T) + lengths -> list of transcripts."""
        ids, lengths = output_values
        texts = []
        for row, n in zip(np.asarray(ids), np.asarray(lengths)):
            texts.append(self.get_data_layer().decode_ids(row[:int(n)]))
        return texts

    def evaluate(self, input_values: Dict[str, Any],
                 output_values: Dict[str, Any]):
        """Per-batch eval: accumulate (edit_distance, ref_words) over the
        valid slice of the batch (reference WER accounting,
        `models/speech2text.py:51-97`)."""
        valid = int(input_values.get("batch_valid",
                                     input_values["source_tensors"][0].shape[0]))
        decoded = self._decode_batch(
            output_values["outputs"]["decoder_output"]["outputs"])[:valid]
        labels, label_lens = input_values["target_tensors"]
        total_dist, total_words = 0, 0
        for i in range(valid):
            ref = self.get_data_layer().decode_ids(
                labels[i][:int(label_lens[i])])
            hyp = decoded[i]
            total_dist += levenshtein(ref.split(), hyp.split())
            total_words += len(ref.split())
        return (total_dist, total_words,
                float(output_values.get("loss", 0.0)) * valid, valid)

    def finalize_evaluation(self, results_per_batch, training_step=None):
        total_dist = sum(r[0] for r in results_per_batch)
        total_words = sum(r[1] for r in results_per_batch)
        total_loss = sum(r[2] for r in results_per_batch)
        total_count = sum(r[3] for r in results_per_batch)
        wer = total_dist / max(total_words, 1)
        eval_loss = total_loss / max(total_count, 1)
        deco_print("Validation WER: {:.4f}".format(wer), offset=4)
        return {"Eval WER": wer, "eval_loss": eval_loss}

    @property
    def _dump_logits(self) -> bool:
        return bool(self._params.get("decoder_params", {})
                    .get("infer_logits_to_pickle", False))

    def infer(self, input_values, output_values):
        valid = int(input_values.get(
            "batch_valid", input_values["source_tensors"][0].shape[0]))
        ids = np.asarray(input_values["source_ids"])[:valid]
        if self._dump_logits:
            # raw logits for offline beam-search/LM rescoring
            # (reference `decoders/fc_decoders.py:infer_logits_to_pickle`
            # + `scripts/decode.py`)
            dec = output_values["outputs"]["decoder_output"]
            logits = np.asarray(dec["logits"])
            lengths = np.asarray(dec["src_length"])
            return [(int(ids[i]), logits[i, :int(lengths[i])])
                    for i in range(valid)]
        decoded = self._decode_batch(
            output_values["outputs"]["decoder_output"]["outputs"])[:valid]
        return list(zip(ids.tolist(), decoded))

    def finalize_inference(self, results_per_batch, output_file):
        rows = [item for batch in results_per_batch for item in batch]
        rows.sort(key=lambda kv: kv[0])
        files = self.get_data_layer().all_files
        if self._dump_logits:
            import pickle
            dumped = {}
            for idx, logits in rows:
                wav = files[idx][0] if idx < len(files) else str(idx)
                dumped[wav] = logits
            with open(output_file, "wb") as f:
                pickle.dump(dumped, f)
            deco_print("Logits pickled to {}".format(output_file))
            return
        import csv
        with open(output_file, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["wav_filename", "predicted_transcript"])
            for idx, text in rows:
                wav = files[idx][0] if idx < len(files) else str(idx)
                writer.writerow([wav, text])
        deco_print("Predictions saved to {}".format(output_file))

    def maybe_print_logs(self, metrics, step):
        super().maybe_print_logs(metrics, step)

    def print_samples(self, input_values, output_values, step):
        """First-sample target vs greedy prediction + sample WER
        (reference `models/speech2text.py:maybe_print_logs`)."""
        dec = output_values["outputs"]["decoder_output"]
        if "outputs" not in dec:
            return
        hyp = self._decode_batch(dec["outputs"])[0]
        labels, label_lens = input_values["target_tensors"]
        ref = self.get_data_layer().decode_ids(
            labels[0][:int(label_lens[0])])
        wer = levenshtein(ref.split(), hyp.split()) / \
            max(len(ref.split()), 1)
        deco_print("Sample WER: {:.4f}".format(wer), offset=4)
        deco_print("Sample target:     {}".format(ref), offset=4)
        deco_print("Sample prediction: {}".format(hyp), offset=4)

    def _get_num_objects_per_step(self, batch):
        # audio frames processed (reference `models/speech2text.py:356-360`)
        lengths = np.asarray(batch["source_tensors"][1])
        if batch["source_tensors"][0].ndim == 2:
            # raw-audio batches (featurize_on_device): samples -> frames
            hop = int(self.get_data_layer().params.get(
                "window_stride", 10e-3) *
                self.get_data_layer().params.get("sample_freq", 16000))
            return int(np.sum(1 + lengths // hop))
        return int(np.sum(lengths))
