"""Fully-connected decoders (reference
`open_seq2seq/decoders/fc_decoders.py:19-311`).

  * :class:`FullyConnectedDecoder` — one dense layer for classification.
  * :class:`FullyConnectedTimeDecoder` — per-timestep dense projection to
    vocab logits (the reference emits time-major logits for tf's CTC ops;
    on TPU batch-major (B, T, V) is the natural layout and our CTC ops
    take it directly).
  * :class:`FullyConnectedCTCDecoder` — adds on-device greedy CTC
    decoding; beam-search-with-LM decoding is a host-side post-processor
    (see ``openseq2seq_tpu.ops.ctc_beam`` / native decoder, reference
    `fc_decoders.py:218-245`'s custom CUDA op) OR, beyond the
    reference, fully on-device via ``on_device_beam_width`` (prefix
    beam search inside the jitted step, optional dense n-gram shallow
    fusion — `ops/ctc_beam_tpu.py`).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from .decoder import Decoder
from ..parts.initializers import resolve_initializer
from ..ops.ctc import ctc_greedy_decode
from ..ops.ctc_beam_tpu import FusionLM, ctc_beam_search_tpu
from ..utils.logging import deco_print


class FullyConnectedDecoder(Decoder):

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "output_dim": int,
        })

    def make_module(self):
        output_dim = self._params["output_dim"]
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        kinit = resolve_initializer(
            self._params.get("initializer"),
            self._params.get("initializer_params")) or \
            nn.linear.default_kernel_init

        class FCDecoderModule(nn.Module):
            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x = input_dict["encoder_output"]["outputs"]
                if x.ndim > 2:
                    x = x.reshape((x.shape[0], -1))
                logits = nn.Dense(output_dim, dtype=dtype,
                                  kernel_init=kinit,
                                  param_dtype=jnp.float32,
                                  name="fully_connected")(x)
                return {"logits": logits,
                        "outputs": [jnp.argmax(logits, axis=-1)]}

        return FCDecoderModule()


class FullyConnectedTimeDecoder(Decoder):

    @staticmethod
    def get_required_params():
        return dict(Decoder.get_required_params(), **{
            "tgt_vocab_size": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Decoder.get_optional_params(), **{
            "logits_to_outputs_func": None,
            "infer_logits_to_pickle": bool,
        })

    def make_module(self):
        vocab = self._params["tgt_vocab_size"]
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        to_outputs = self._params.get("logits_to_outputs_func", None)
        kinit = resolve_initializer(
            self._params.get("initializer"),
            self._params.get("initializer_params")) or \
            nn.linear.default_kernel_init

        class FCTimeDecoderModule(nn.Module):
            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x = input_dict["encoder_output"]["outputs"]
                src_length = input_dict["encoder_output"]["src_length"]
                logits = nn.Dense(vocab, dtype=dtype,
                                  kernel_init=kinit,
                                  param_dtype=jnp.float32,
                                  name="fully_connected")(x)
                # logits feed fp32 losses/decoders
                logits = logits.astype(jnp.float32)
                out = {"logits": logits, "src_length": src_length}
                if to_outputs is not None:
                    out["outputs"] = to_outputs(logits, src_length)
                return out

        return FCTimeDecoderModule()


class FullyConnectedCTCDecoder(FullyConnectedTimeDecoder):
    """FC time decoder + greedy CTC decode on device. LM beam-search
    parameters are accepted for config parity; the beam decode itself is
    host-side (logits are fetched and handed to the beam decoder) —
    matching the reference's two-path design."""

    @staticmethod
    def get_required_params():
        return dict(FullyConnectedTimeDecoder.get_required_params(), **{
            "use_language_model": bool,
        })

    @staticmethod
    def get_optional_params():
        return dict(FullyConnectedTimeDecoder.get_optional_params(), **{
            "decoder_library_path": str,
            "beam_width": int,
            "alpha": float,
            "beta": float,
            "trie_weight": float,
            "lm_path": str,
            "trie_path": str,
            "alphabet_config_path": str,
            "on_device_beam_width": int,   # >1: beam search inside the
                                           # jitted step (ctc_beam_tpu)
            "on_device_fusion": dict,      # keys: lm_path, labels?,
                                           # alpha?, beta?, order? —
                                           # dense n-gram shallow fusion
        })

    def __init__(self, params, model, name="fully_connected_ctc_decoder",
                 mode="train"):
        super().__init__(params, model, name, mode)
        if self._params["use_language_model"]:
            # host-side beam+LM decoding consumes dumped logits; the
            # in-graph decode stays greedy
            self._params.setdefault("infer_logits_to_pickle", False)
        # reference-config compatibility keys with no effect here: the
        # native decoder is bundled (no .so path) and its trie is built
        # from the LM vocabulary at load — say so rather than silently
        # ignoring them
        for legacy in ("decoder_library_path", "trie_path",
                       "trie_weight"):
            if legacy in self._params:
                deco_print(
                    "NOTE: decoder_params['{}'] is accepted for "
                    "reference-config compatibility but has no effect "
                    "(see docs/migrating.md)".format(legacy))

    def _make_fusion(self):
        fus = self._params.get("on_device_fusion")
        if not fus:
            return None
        from ..ops.ngram_fusion import dense_label_lm
        labels = fus.get("labels")
        if labels is None:
            c2i = self._model.get_data_layer().params["char2idx"]
            labels = tuple(sorted(c2i, key=c2i.get))
        table, C, m, init_ctx = dense_label_lm(
            fus["lm_path"], tuple(labels), order=fus.get("order", 3))
        return FusionLM(jnp.asarray(table), C, m, init_ctx,
                        float(fus.get("alpha", 0.5)),
                        float(fus.get("beta", 0.0)))

    def make_module(self):
        vocab = self._params["tgt_vocab_size"]
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        beam_k = int(self._params.get("on_device_beam_width", 0))
        fusion = self._make_fusion() if beam_k > 1 else None
        kinit = resolve_initializer(
            self._params.get("initializer"),
            self._params.get("initializer_params")) or \
            nn.linear.default_kernel_init

        class FCCTCDecoderModule(nn.Module):
            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x = input_dict["encoder_output"]["outputs"]
                src_length = input_dict["encoder_output"]["src_length"]
                logits = nn.Dense(vocab, dtype=dtype,
                                  kernel_init=kinit,
                                  param_dtype=jnp.float32,
                                  name="fully_connected")(x)
                logits = logits.astype(jnp.float32)
                out: Dict[str, Any] = {"logits": logits,
                                       "src_length": src_length}
                if not train:
                    if beam_k > 1:
                        ids3, lens2, scores = ctc_beam_search_tpu(
                            logits, src_length, beam_width=beam_k,
                            fusion=fusion)
                        out["outputs"] = [ids3[:, 0], lens2[:, 0]]
                        out["beam_scores"] = scores
                    else:
                        ids, lengths = ctc_greedy_decode(logits,
                                                         src_length)
                        out["outputs"] = [ids, lengths]
                return out

        return FCCTCDecoderModule()


class FullyConnectedSCDecoder(FullyConnectedDecoder):
    """Speech-commands decoder: FC over flattened/pooled features
    (reference `fc_decoders.py:256-311`). The generic FC decoder already
    flattens >2-D encoder outputs; this named subclass keeps config
    parity and masks by sequence length via mean pooling."""

    def make_module(self):
        import flax.linen as nn
        import jax.numpy as jnp

        output_dim = self._params["output_dim"]
        dtype = jnp.float32 if self._model is None \
            else self._model.mp_policy.compute_dtype
        kinit = resolve_initializer(
            self._params.get("initializer"),
            self._params.get("initializer_params")) or \
            nn.linear.default_kernel_init

        class FCSCDecoderModule(nn.Module):
            @nn.compact
            def __call__(self, input_dict, train: bool):
                x = input_dict["encoder_output"]["outputs"]
                lengths = input_dict["encoder_output"].get("src_length")
                if x.ndim == 3 and lengths is not None:
                    mask = (jnp.arange(x.shape[1])[None, :] <
                            lengths[:, None]).astype(x.dtype)
                    x = jnp.sum(x * mask[:, :, None], axis=1) / \
                        jnp.maximum(jnp.sum(mask, axis=1),
                                    1.0)[:, None]
                elif x.ndim > 2:
                    x = x.reshape((x.shape[0], -1))
                logits = nn.Dense(output_dim, dtype=dtype,
                                  kernel_init=kinit,
                                  param_dtype=jnp.float32,
                                  name="fully_connected")(x)
                return {"logits": logits.astype(jnp.float32),
                        "outputs": [jnp.argmax(logits, axis=-1)]}

        return FCSCDecoderModule()
