"""Neural LM rescoring of ASR n-best lists (reference
`external_lm_rescore/` — a PyTorch Transformer-XL rescorer over dumped
beams; here the rescorer is a framework-native LM, so the whole flow
stays in one stack). Works with any LM built on :class:`LSTMLM` — the
scan-LSTM LM or the Transformer-XL encoder
(`encoders/transformer_xl_encoder.py`, recipe
`example_configs/lm/txl_wkt103.py`), matching the reference's TXL
rescorer without the external PyTorch dependency.

Final score per hypothesis:
    am_score + lm_weight * lm_logprob + word_bonus * num_words
with lm_logprob computed by a trained :class:`LSTMLM` (jitted batch
scoring).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class NeuralRescorer:

    def __init__(self, lm_model, checkpoint: str):
        """``lm_model`` is an LSTMLM built in eval mode with its
        WKT-style data layer (provides the vocab)."""
        from ..training.trainer import restore_state
        self.model = lm_model
        self.state = restore_state(lm_model, checkpoint)
        self.word2idx = lm_model.get_data_layer().corp.word2idx
        self.unk = self.word2idx.get("<unk>", 0)
        self.eos = self.word2idx.get("<eos>", 1)

        def score_batch(x, lengths):
            variables = {"params": self.state.params,
                         **self.state.model_state}
            out = self.model.module().apply(
                variables, {"source_tensors": [x, lengths]},
                train=False, rngs={"dropout": jax.random.PRNGKey(0)})
            logits = out["decoder_output"]["logits"]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            # next-token scoring: position t predicts x[t+1]
            tgt = x[:, 1:]
            tok_lp = jnp.take_along_axis(
                logp[:, :-1], tgt[..., None], axis=-1)[..., 0]
            mask = (jnp.arange(tgt.shape[1])[None, :] <
                    (lengths - 1)[:, None]).astype(jnp.float32)
            return jnp.sum(tok_lp * mask, axis=1)

        self._score = jax.jit(score_batch)

    def _encode(self, text: str) -> List[int]:
        toks = text.split()
        return ([self.eos] +
                [self.word2idx.get(t, self.unk) for t in toks] +
                [self.eos])

    def lm_scores(self, texts: Sequence[str]) -> np.ndarray:
        ids = [self._encode(t) for t in texts]
        T = max(max(len(i) for i in ids), 2)
        T = (T + 7) // 8 * 8
        x = np.zeros((len(ids), T), np.int32)
        lengths = np.zeros((len(ids),), np.int32)
        for i, seq in enumerate(ids):
            x[i, :len(seq)] = seq
            lengths[i] = len(seq)
        return np.asarray(self._score(jnp.asarray(x),
                                      jnp.asarray(lengths)))

    def rescore(self, nbest: Sequence[Sequence[Tuple[float, str]]],
                lm_weight: float = 0.5,
                word_bonus: float = 0.0) -> List[str]:
        """nbest: per-utterance [(am_score, text), ...]; returns the
        best text per utterance after combination."""
        flat_texts, offsets = [], [0]
        for hyps in nbest:
            flat_texts.extend(t for _, t in hyps)
            offsets.append(len(flat_texts))
        lm = self.lm_scores(flat_texts) if flat_texts else np.zeros(0)
        out = []
        for ui, hyps in enumerate(nbest):
            best_text, best_score = "", -np.inf
            for hi, (am, text) in enumerate(hyps):
                score = (am + lm_weight * lm[offsets[ui] + hi] +
                         word_bonus * len(text.split()))
                if score > best_score:
                    best_score, best_text = score, text
            out.append(best_text)
        return out
