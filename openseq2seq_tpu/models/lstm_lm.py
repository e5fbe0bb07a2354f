"""LSTM language model task (reference
`open_seq2seq/models/lstm_lm.py:10-309`): perplexity (or bits-per-char)
on eval, greedy text generation on infer, and transfer to IMDB/SST
sentiment classification (accuracy metric, `utils/metrics.py:8-25`).
"""
from __future__ import annotations

import math

import numpy as np

from .encoder_decoder import EncoderDecoderModel
from ..utils.logging import deco_print


class LSTMLM(EncoderDecoderModel):

    def __init__(self, params, mode="train", mesh=None,
                 num_workers=1, worker_id=0):
        super().__init__(params, mode, mesh, num_workers, worker_id)
        dl = self.get_data_layer()
        self._lm_mode = self._params.get("encoder_params", {}).get(
            "lm_mode", True)

    def _create_encoder(self):
        dl_params = self.get_data_layer().params
        self._params.setdefault("encoder_params", {})
        ep = self._params["encoder_params"]
        ep.setdefault("vocab_size", dl_params["vocab_size"])
        ep.setdefault("end_token", dl_params.get("end_token", 1))
        ep.setdefault("batch_size", dl_params["batch_size"])
        if "num_classes" in dl_params:
            ep.setdefault("lm_mode", False)
            ep.setdefault("num_classes", dl_params["num_classes"])
        return super()._create_encoder()

    def _create_loss(self):
        loss_cls = self._params.get("loss")
        if loss_cls is not None:
            accepts = {**loss_cls.get_required_params(),
                       **loss_cls.get_optional_params()}
            self._params.setdefault("loss_params", {})
            lp = self._params["loss_params"]
            dl_params = self.get_data_layer().params
            if "tgt_vocab_size" in accepts:
                lp.setdefault("tgt_vocab_size", dl_params["vocab_size"])
            if "batch_size" in accepts:
                lp.setdefault("batch_size", dl_params["batch_size"])
            # WKT targets are already next-token aligned
            if "offset_target_by_one" in accepts:
                lp.setdefault("offset_target_by_one", False)
            if "average_across_timestep" in accepts:
                lp.setdefault("average_across_timestep", True)
        return super()._create_loss()

    # ------------------------------------------------------------------
    def evaluate(self, input_values, output_values):
        valid = int(input_values.get(
            "batch_valid", input_values["source_tensors"][0].shape[0]))
        if self._lm_mode:
            tokens = int(np.sum(np.asarray(
                input_values["target_tensors"][1])[:valid]))
            loss = float(output_values.get("loss", 0.0))
            return (loss * tokens, tokens)
        logits = np.asarray(
            output_values["outputs"]["decoder_output"]["logits"])[:valid]
        labels = np.asarray(input_values["target_tensors"][0])[:valid]
        correct = int(np.sum(np.argmax(logits, -1) == labels))
        return (correct, valid)

    def finalize_evaluation(self, results_per_batch, training_step=None):
        if self._lm_mode:
            total_nll = sum(r[0] for r in results_per_batch)
            total_tokens = sum(r[1] for r in results_per_batch)
            avg = total_nll / max(total_tokens, 1)
            ppl = math.exp(min(avg, 30.0))
            deco_print("Validation perplexity: {:.2f}".format(ppl),
                       offset=4)
            return {"Eval perplexity": ppl, "eval_loss": avg}
        correct = sum(r[0] for r in results_per_batch)
        total = sum(r[1] for r in results_per_batch)
        acc = correct / max(total, 1)
        deco_print("Validation accuracy: {:.4f}".format(acc), offset=4)
        return {"Eval accuracy": acc, "eval_loss": 1.0 - acc}

    # ------------------------------------------------------------------
    def infer(self, input_values, output_values):
        if not self._lm_mode:
            logits = np.asarray(
                output_values["outputs"]["decoder_output"]["logits"])
            valid = int(input_values.get("batch_valid", logits.shape[0]))
            return list(np.argmax(logits[:valid], -1).tolist())
        # LM infer: return argmax continuations for dumped analysis
        logits = np.asarray(
            output_values["outputs"]["decoder_output"]["logits"])
        return [np.argmax(logits, -1)]

    def finalize_inference(self, results_per_batch, output_file):
        with open(output_file, "w") as f:
            for batch in results_per_batch:
                for row in batch:
                    f.write("{}\n".format(row))
        deco_print("Predictions saved to {}".format(output_file))

    # ------------------------------------------------------------------
    def generate(self, state, seed_tokens=None, num_tokens=50,
                 temperature: float = 0.0, rng_seed: int = 0):
        """Greedy / temperature-sampled text generation (reference
        infer-mode generation, `models/lstm_lm.py` + ``seed_tokens`` /
        ``num_tokens_gen`` encoder params). Re-runs the LM over the
        growing prefix in a fixed-size buffer (one compilation)."""
        import jax
        import jax.numpy as jnp
        dl = self.get_data_layer()
        w2i = dl.corp.word2idx
        i2w = dl.corp.idx2word
        seed_tokens = seed_tokens or \
            str(self._params.get("encoder_params", {})
                .get("seed_tokens", "the")).split()
        ids = [w2i.get(t, w2i.get("<unk>", 0)) for t in seed_tokens]
        max_len = ((len(ids) + num_tokens + 7) // 8) * 8
        buf = np.zeros((1, max_len), np.int32)
        buf[0, :len(ids)] = ids

        @jax.jit
        def logits_at(x, pos):
            variables = {"params": state.params, **state.model_state}
            out = self.module().apply(
                variables,
                {"source_tensors": [x, jnp.full((1,), max_len,
                                                jnp.int32)]},
                train=False, rngs={"dropout": jax.random.PRNGKey(0)})
            return jax.lax.dynamic_slice_in_dim(
                out["decoder_output"]["logits"][0], pos, 1, axis=0)[0]

        key = jax.random.PRNGKey(rng_seed)
        pos = len(ids) - 1
        for _ in range(num_tokens):
            logits = logits_at(jnp.asarray(buf), pos)
            if temperature > 0:
                key, sub = jax.random.split(key)
                nxt = int(jax.random.categorical(
                    sub, logits / temperature))
            else:
                nxt = int(jnp.argmax(logits))
            pos += 1
            if pos >= max_len:
                break
            buf[0, pos] = nxt
        return " ".join(i2w.get(int(i), "<unk>")
                        for i in buf[0, :pos + 1])

    def _get_num_objects_per_step(self, batch):
        return int(np.sum(np.asarray(batch["source_tensors"][1])))
