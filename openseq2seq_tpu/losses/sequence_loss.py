"""Sequence losses for NMT/LM (reference
`open_seq2seq/losses/sequence_loss.py:10,117,233`):

  * :class:`BasicSequenceLoss` — token- or sample-averaged CE over valid
    positions (offset_target_by_one for autoregressive decoders).
  * :class:`CrossEntropyWithSmoothing` — label-smoothed CE, same
    averaging options.
  * :class:`PaddedCrossEntropyLossWithSmoothing` — transformer-style
    smoothing with the exact normalizing constant, averaged over
    non-pad tokens (pad id 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .loss import Loss


def _valid_mask(labels_shape, lengths):
    T = labels_shape[1]
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)


class BasicSequenceLoss(Loss):

    @staticmethod
    def get_required_params():
        return dict(Loss.get_required_params(), **{
            "tgt_vocab_size": int,
            "batch_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "offset_target_by_one": bool,
            "average_across_timestep": bool,
            "do_mask": bool,
        })

    def __init__(self, params, model, name="basic_sequence_loss"):
        super().__init__(params, model, name)
        self._offset = self._params.get("offset_target_by_one", True)
        self._avg_time = self._params.get("average_across_timestep", False)
        self._do_mask = self._params.get("do_mask", True)

    def compute_loss(self, input_dict):
        logits = input_dict["decoder_output"]["logits"].astype(jnp.float32)
        labels, lengths = input_dict["target_tensors"]
        if self._offset:
            # predict y[t+1] from position t: drop first label, last logit
            labels = labels[:, 1:]
            lengths = lengths - 1
        logits = logits[:, :labels.shape[1], :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        mask = _valid_mask(labels.shape, lengths) if self._do_mask \
            else jnp.ones_like(nll)
        total = jnp.sum(nll * mask)
        if self._avg_time:
            return total / jnp.maximum(jnp.sum(mask), 1.0)
        return total / self._params["batch_size"]


class CrossEntropyWithSmoothing(Loss):

    @staticmethod
    def get_required_params():
        return dict(Loss.get_required_params(), **{
            "tgt_vocab_size": int,
            "batch_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "offset_target_by_one": bool,
            "average_across_timestep": bool,
            "do_mask": bool,
            "label_smoothing": float,
        })

    def __init__(self, params, model, name="cross_entropy_with_smoothing"):
        super().__init__(params, model, name)
        self._offset = self._params.get("offset_target_by_one", True)
        self._avg_time = self._params.get("average_across_timestep", False)
        self._do_mask = self._params.get("do_mask", True)
        self._smoothing = self._params.get("label_smoothing", 0.0)

    def compute_loss(self, input_dict):
        logits = input_dict["decoder_output"]["logits"].astype(jnp.float32)
        labels, lengths = input_dict["target_tensors"]
        if self._offset:
            labels = labels[:, 1:]
            lengths = lengths - 1
        logits = logits[:, :labels.shape[1], :]
        V = self._params["tgt_vocab_size"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, V, dtype=jnp.float32)
        smoothed = onehot * (1.0 - self._smoothing) + self._smoothing / V
        nll = -jnp.sum(smoothed * logp, axis=-1)
        mask = _valid_mask(labels.shape, lengths) if self._do_mask \
            else jnp.ones_like(nll)
        total = jnp.sum(nll * mask)
        if self._avg_time:
            return total / jnp.maximum(jnp.sum(mask), 1.0)
        return total / self._params["batch_size"]


class PaddedCrossEntropyLossWithSmoothing(Loss):
    """Transformer-style smoothing: confidence on the gold class, uniform
    mass over the other V-1 classes, minimum-possible-loss constant
    subtracted, averaged over non-pad (id != 0) positions (reference
    `losses/sequence_loss.py:233-311`)."""

    @staticmethod
    def get_optional_params():
        return dict(Loss.get_optional_params(), **{
            "batch_size": int,
            "tgt_vocab_size": int,
            "label_smoothing": float,
            "pad_embeddings_2_eight": bool,
        })

    def __init__(self, params, model, name="padded_cross_entropy"):
        super().__init__(params, model, name)
        self._smoothing = self._params.get("label_smoothing", 0.0)

    def compute_loss(self, input_dict):
        logits = input_dict["decoder_output"]["logits"].astype(jnp.float32)
        labels = input_dict["target_tensors"][0]
        logits = logits[:, :labels.shape[1], :]
        V = logits.shape[-1]
        confidence = 1.0 - self._smoothing
        low_confidence = self._smoothing / (V - 1) if V > 1 else 0.0
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, V, dtype=jnp.float32)
        soft = onehot * confidence + (1.0 - onehot) * low_confidence
        xent = -jnp.sum(soft * logp, axis=-1)
        if self._smoothing > 0 and V > 1:
            normalizing = -(confidence * jnp.log(confidence) + (V - 1) *
                            low_confidence * jnp.log(low_confidence + 1e-20))
            xent = xent - normalizing
        mask = (labels != 0).astype(jnp.float32)
        return jnp.sum(xent * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class BasicSampledSequenceLoss(BasicSequenceLoss):
    """Sampled-softmax sequence loss (reference
    `losses/sequence_loss.py:312-454` + `tf.nn.sampled_softmax_loss`).

    When the decoder output carries the sampled-softmax bundle
    (``weights`` (V, H), ``bias`` (V,), ``inputs`` (B, T, H),
    ``num_sampled`` — the LM encoder emits it in train mode when
    ``num_sampled`` < vocab), the candidate-sampling estimator runs:
    ``num_sampled`` negatives drawn from the log-uniform (Zipf) base
    distribution, expected-count correction subtracted from both true
    and sampled logits, accidental hits masked, softmax CE over
    [true | sampled]. Candidates are drawn with a key derived from the
    target ids (the reference's sampler is stateful-random; ours is a
    deterministic function of the batch, which keeps the step pure and
    reproducible). Otherwise falls back to the exact full softmax —
    note that on TPU the full (B*T, V) softmax is one well-tiled MXU
    matmul and often *faster*; sampling mainly saves HBM on very large
    vocabularies."""

    @staticmethod
    def get_optional_params():
        return dict(BasicSequenceLoss.get_optional_params(), **{
            "hid_dim": int,
            "num_sampled": int,
            "sample_seed": int,
        })

    def compute_loss(self, input_dict):
        dec = input_dict["decoder_output"]
        if "weights" not in dec:
            return super().compute_loss(input_dict)

        labels, lengths = input_dict["target_tensors"]
        inputs = dec["inputs"].astype(jnp.float32)         # (B, T, H)
        if self._offset:
            labels = labels[:, 1:]
            lengths = lengths - 1
        inputs = inputs[:, :labels.shape[1], :]
        B, T, H = inputs.shape
        w = dec["weights"].astype(jnp.float32)             # (V, H)
        b = dec["bias"].astype(jnp.float32)                # (V,)
        V = self._params["tgt_vocab_size"]
        S = int(dec["num_sampled"])

        flat_in = inputs.reshape(-1, H)                    # (N, H)
        flat_lab = labels.reshape(-1)                      # (N,)

        # log-uniform (Zipf) base distribution over class ids.
        # q(k) = log((k+2)/(k+1))/log(V+1) MUST be computed as
        # log1p(1/(k+1)): the difference-of-logs form is a
        # catastrophic cancellation at large k — ~1/k against an ulp
        # of ~1e-6 — and the TPU's log approximation makes it
        # literally zero for 2385 of the 268k wkt103 ids (measured
        # on-chip: log(0) = -inf poisoned every big-vocab LM step
        # through logsumexp; CPU's more accurate log masked the bug).
        def log_q(ids):
            k = ids.astype(jnp.float32)
            return jnp.log(jnp.log1p(1.0 / (k + 1.0)) /
                           jnp.log1p(float(V)))

        key = dec.get("sample_rng")
        if key is None:
            key = jax.random.PRNGKey(self._params.get("sample_seed", 0))
        key = jax.random.fold_in(key, jnp.sum(flat_lab))
        u = jax.random.uniform(key, (S,), minval=0.0, maxval=1.0)
        sampled = jnp.clip(
            jnp.floor(jnp.exp(u * jnp.log(float(V) + 1.0))) - 1.0,
            0, V - 1).astype(jnp.int32)                    # (S,)

        true_logit = (jnp.sum(flat_in * w[flat_lab], axis=-1) +
                      b[flat_lab] - log_q(flat_lab))       # (N,)
        samp_logits = (flat_in @ w[sampled].T + b[sampled] -
                       log_q(sampled))                     # (N, S)
        # remove accidental hits (a sampled negative == the true class)
        hit = sampled[None, :] == flat_lab[:, None]
        samp_logits = jnp.where(hit, -1e9, samp_logits)

        cat = jnp.concatenate([true_logit[:, None], samp_logits], axis=1)
        nll = (jax.nn.logsumexp(cat, axis=1) - cat[:, 0]).reshape(B, T)
        mask = _valid_mask(labels.shape, lengths) if self._do_mask \
            else jnp.ones_like(nll)
        total = jnp.sum(nll * mask)
        if self._avg_time:
            return total / jnp.maximum(jnp.sum(mask), 1.0)
        return total / self._params["batch_size"]
