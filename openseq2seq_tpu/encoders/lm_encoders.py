"""Language-model encoder (reference
`open_seq2seq/encoders/lm_encoders.py:17-447`).

Embedding + LSTM stack; in LM mode the encoder itself produces vocab
logits (the decoder is a pass-through ``FakeDecoder``), optionally with
the softmax weights tied to the embedding. In classification mode
(IMDB/SST transfer) the last valid hidden state feeds an FC head.

AWD-style regularization knobs (embedding dropout, per-layer
input/output dropout) are supported; DropConnect-style recurrent weight
dropout is approximated by variational output dropout (a jit-friendly
equivalent; the reference's cuDNN path doesn't support it either).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..parts.dropout import Dropout
import jax
import jax.numpy as jnp

from .encoder import Encoder
from ..parts.rnns.rnn import FLSTM, GRU, LSTM, LayerNormLSTM, SLSTM


class LMNet(nn.Module):
    vocab_size: int
    emb_size: int
    encoder_layers: int
    hidden_size: int
    weight_tied: bool
    lm_mode: bool                 # True: LM logits; False: classification
    fc_dim: int                   # classification head width (0 = none)
    num_classes: int              # classification classes
    emb_keep_prob: float
    input_keep_prob: float
    output_keep_prob: float
    last_output_keep_prob: float
    use_cell_state: bool
    cell_type: str
    dtype_: Any
    num_sampled: int = 0          # >0 and < vocab: emit the sampled-
                                  # softmax bundle in train mode
    fact_size: int = 0            # flstm bottleneck
    num_proj: int = 0             # flstm output projection
    recurrent_weight_keep_prob: float = 1.0   # weight-drop LN LSTM

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        table = self.param("embedding",
                           nn.initializers.uniform(scale=0.1),
                           (self.vocab_size, self.emb_size), jnp.float32)
        h = jnp.take(table.astype(self.dtype_), x, axis=0)
        if train and self.emb_keep_prob < 1.0:
            # embedding dropout: drop whole words (rows), AWD-style
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, self.emb_keep_prob,
                                        (self.vocab_size, 1))
            scaled = jnp.where(keep, 1.0 / self.emb_keep_prob, 0.0)
            h = h * jnp.take(scaled.astype(self.dtype_), x, axis=0)

        states = []
        for i in range(self.encoder_layers):
            is_last = i == self.encoder_layers - 1
            in_keep = self.input_keep_prob if train else 1.0
            out_keep = (self.last_output_keep_prob if is_last
                        else self.output_keep_prob) if train else 1.0
            if in_keep < 1.0:
                h = Dropout(rate=1.0 - in_keep, broadcast_dims=(1,),
                               deterministic=not train)(h)
            size = self.hidden_size if not (is_last and self.lm_mode and
                                            self.weight_tied) \
                else self.emb_size
            name = "rnn{}".format(i + 1)
            if self.cell_type == "gru":
                h, state = GRU(size, dtype=self.dtype_,
                               name=name)(h, lengths)
                states.append((state, state))
            elif self.cell_type == "slstm":
                h, state = SLSTM(size, dtype=self.dtype_,
                                 name=name)(h, lengths)
                states.append(state)
            elif self.cell_type == "flstm":
                h, state = FLSTM(size,
                                 fact_size=self.fact_size or size // 2,
                                 num_proj=self.num_proj,
                                 dtype=self.dtype_, name=name)(h, lengths)
                states.append(state)
            elif self.cell_type == "layernorm_lstm":
                h, state = LayerNormLSTM(
                    size,
                    recurrent_weight_keep_prob=(
                        self.recurrent_weight_keep_prob),
                    train=train, dtype=self.dtype_,
                    name=name)(h, lengths)
                states.append(state)
            else:
                h, state = LSTM(size, dtype=self.dtype_,
                                name=name)(h, lengths)
                states.append(state)
            if out_keep < 1.0:
                h = Dropout(rate=1.0 - out_keep, broadcast_dims=(1,),
                               deterministic=not train)(h)

        if self.lm_mode:
            if self.weight_tied:
                weights = table.astype(jnp.float32)         # (V, E)
                bias = self.param("softmax_bias", nn.initializers.zeros,
                                  (self.vocab_size,), jnp.float32)
            else:
                dense = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="softmax")
                weights = None
                bias = None
            sampling = (train and 0 < self.num_sampled < self.vocab_size)
            out = {"outputs": h, "src_length": lengths}
            if weights is None:
                if sampling:
                    # touch the projection so its params exist, but do
                    # NOT materialize full (B, T, V) logits — at
                    # wkt103 scale that tensor is 21 GiB and the
                    # sampled-softmax loss never reads it (it runs on
                    # the weights/inputs bundle below)
                    _ = dense(h[:, :1].astype(jnp.float32))
                    # Dense kernel is (E, V): hand the loss (V, E)
                    weights = dense.variables["params"]["kernel"].T
                    bias = dense.variables["params"]["bias"]
                else:
                    out["logits"] = dense(h.astype(jnp.float32))
            elif not sampling:
                out["logits"] = jnp.einsum(
                    "btd,vd->btv", h.astype(jnp.float32), weights) + bias
            if sampling:
                # sampled-softmax bundle (reference
                # `encoders/lm_encoders.py:375-381`): the loss computes
                # the candidate-sampling estimator from these. The rng
                # rides along so candidates are redrawn every step —
                # fixed candidates leave real competitors unpenalized
                # and full-softmax eval degrades badly.
                out.update({"weights": weights, "bias": bias,
                            "inputs": h.astype(jnp.float32),
                            "num_sampled": self.num_sampled,
                            "sample_rng": self.make_rng("dropout")})
            return out

        # classification: gather last valid hidden state (and cell state
        # if requested)
        idx = jnp.clip(lengths - 1, 0, h.shape[1] - 1)
        last_h = jnp.take_along_axis(
            h, idx[:, None, None].repeat(h.shape[2], axis=2), axis=1)[:, 0]
        feat = last_h
        if self.use_cell_state:
            last_c = states[-1][1].astype(feat.dtype)
            feat = jnp.concatenate([feat, last_c], axis=-1)
        if self.fc_dim > 0:
            feat = jax.nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype_,
                                        param_dtype=jnp.float32,
                                        name="fc_hidden")(feat))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          name="classifier")(feat.astype(jnp.float32))
        return {"logits": logits, "outputs": feat, "src_length": lengths}


class LMEncoder(Encoder):
    """Config wrapper; key schema entries mirror the reference
    (`lm_encoders.py:22-64`); cuDNN/cell selection keys are accepted and
    mapped onto the scan kernels."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "vocab_size": int,
            "emb_size": int,
            "encoder_layers": int,
            "encoder_use_skip_connections": bool,
            "core_cell": None,
            "core_cell_params": dict,
            "end_token": int,
            "batch_size": int,
            "use_cudnn_rnn": bool,
            "cudnn_rnn_type": None,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "encoder_dp_input_keep_prob": float,
            "encoder_dp_output_keep_prob": float,
            "encoder_last_input_keep_prob": float,
            "encoder_last_output_keep_prob": float,
            "encoder_emb_keep_prob": float,
            "variational_recurrent": bool,
            "time_major": bool,
            "use_swap_memory": bool,
            "proj_size": int,
            "num_groups": int,
            "num_tokens_gen": int,
            "fc_use_bias": bool,
            "seed_tokens": list,
            "sampling_prob": float,
            "schedule_learning": bool,
            "weight_tied": bool,
            "awd_initializer": bool,
            "recurrent_keep_prob": float,
            "input_weight_keep_prob": float,
            "recurrent_weight_keep_prob": float,
            "weight_variational": bool,
            "dropout_seed": int,
            "num_sampled": int,
            "fc_dim": int,
            "use_cell_state": bool,
            "lm_mode": bool,
            "num_classes": int,
        })

    def make_module(self):
        p = self._params
        core_params = p.get("core_cell_params", {})
        hidden = core_params.get("num_units", p["emb_size"])
        # core_cell selects the recurrent cell: a string, or (reference
        # config parity) a class whose NAME matches the reference cells
        # (`parts/rnns/{flstm,slstm}.py`, WeightDropLayerNormBasicLSTMCell)
        core = p.get("core_cell")
        core_name = (core if isinstance(core, str)
                     else getattr(core, "__name__", "")) or ""
        core_name = core_name.lower()
        if "slstm" in core_name:
            cell_type = "slstm"
        elif "flstm" in core_name:
            cell_type = "flstm"
        elif "layernorm" in core_name or "layer_norm" in core_name:
            cell_type = "layernorm_lstm"
        elif "gru" in core_name or "gru" in str(
                p.get("cudnn_rnn_type", "")).lower():
            cell_type = "gru"
        else:
            cell_type = "lstm"
        lm_mode = p.get("lm_mode", True)
        net = LMNet(
            vocab_size=p["vocab_size"],
            emb_size=p["emb_size"],
            encoder_layers=p["encoder_layers"],
            hidden_size=hidden,
            weight_tied=p.get("weight_tied", False),
            lm_mode=lm_mode,
            fc_dim=p.get("fc_dim", 0),
            num_classes=p.get("num_classes", 2),
            emb_keep_prob=p.get("encoder_emb_keep_prob", 1.0),
            input_keep_prob=p.get("encoder_dp_input_keep_prob", 1.0),
            output_keep_prob=p.get("encoder_dp_output_keep_prob", 1.0),
            last_output_keep_prob=p.get("encoder_last_output_keep_prob",
                                        1.0),
            use_cell_state=p.get("use_cell_state", False),
            cell_type=cell_type,
            dtype_=self.compute_dtype,
            num_sampled=p.get("num_sampled", 0),
            fact_size=core_params.get("fact_size", 0),
            num_proj=core_params.get("num_proj", 0),
            recurrent_weight_keep_prob=p.get(
                "recurrent_weight_keep_prob", 1.0))

        class LMEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                return self.net(x, lengths, train)

        return LMEncoderModule(net=net)
