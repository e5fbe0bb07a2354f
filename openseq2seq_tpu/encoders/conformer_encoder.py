"""Conformer encoder (Gulati et al. 2020) — beyond-parity ASR encoder.

No reference counterpart: OpenSeq2Seq predates the Conformer; its ASR
encoders stop at TDNN/DS2/LAS (`open_seq2seq/encoders/`). This is the
architecture that superseded Jasper/QuartzNet on LibriSpeech, and it is
a natural TPU citizen — the whole block is matmuls (MXU) plus a short
depthwise conv (VPU), with static shapes throughout. It plugs into the
existing Speech2Text stack unchanged: Conformer →
FullyConnectedCTCDecoder → CTCLoss (Pallas) → WER, sharing the data
layer, trainer, beam/LM decode ladder and streaming apps.

TPU-first design notes:

* Subsampling front end is two stride-2 2-D convs over (time, freq) —
  4× time reduction — then one projection matmul; everything stays
  (B, T, C) channel-minor so XLA tiles the convs onto the MXU.
* Self-attention uses Transformer-XL-style relative positions,
  BIDIRECTIONAL: distances d = i−j ∈ [−(K−1), K−1] index a projected
  sinusoidal table of 2K−1 rows, aligned via the pad-reshape relative
  shift over the reversed table (exact; replaced the original
  ``take_along_axis`` gather that dominated the M-scale block — see
  RelPosSelfAttention). ``flash_attention: True`` additionally fuses
  the content-score/softmax/context chain into the Pallas flash kernel
  with the shifted position term as its additive bias.
* The conv module's normalization defaults to layer_norm: batch_norm
  over padded time would fold padding frames into the batch statistics
  unless separately masked; layer_norm is mask-safe and, at ASR batch
  shapes, indistinguishable in quality (batch_norm remains available
  via ``conv_norm: "batch_norm"`` with pre-masked inputs).
* Macaron half-step FFNs and all residual adds run in the compute
  dtype (bf16 under ``dtype: "mixed"``) with fp32 params, and each
  block ends with a ``checkpoint_name`` anchor so the model-level
  ``remat: "blocks"`` policy applies.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..parts.dropout import Dropout
from .encoder import Encoder
from .tdnn_encoder import _mask_time, _out_length
from .transformer_xl_encoder import rel_pos_embedding

NEG_INF = -1e9


def _rel_flash_attend(q_u, q_w, k, v, r_kernel, pad_mask, scale):
    """Flash attention with the rel-pos term FOLDED into the q·k
    product (ops/flash_relpos.py): the sinusoidal position score is
    exactly separable into per-query and per-key augmentations, so the
    custom kernel sees a plain inner product over head dim Dh + D and
    nothing quadratic in T ever touches HBM — no (B,H,T,2T-1) table
    score, no (B,H,T,T) bias (the round-4 ab-bias flash materialized
    the latter and lost; PARITY.md queue17). q_u/q_w are (B,T,H,Dh)
    biased queries (q+u, q+w); r_kernel is the (D,H,Dh) table
    projection; returns the context (B,T,H,Dh).

    The key-side mask derives from contiguous-prefix lengths (ASR
    padding is always a suffix); padded queries attend the valid keys
    and are masked downstream, matching the XLA path."""
    from ..ops import flash_relpos as fr
    lengths = jnp.sum(pad_mask.astype(jnp.int32), axis=1)
    # memory-lean entry: saves only the (B,T,H,Dh) tensors as
    # residuals and rebuilds the augmentation in the backward —
    # saving the augmented q~/k~ per layer re-OOMed Conformer-L bs256
    # (queue19 attempt: 48 GB requested)
    return fr.rel_flash_attention(q_u, q_w, k, v, r_kernel, lengths,
                                  float(scale),
                                  interpret=fr.FORCE_INTERPRET)


class RelPosSelfAttention(nn.Module):
    """Bidirectional multi-head self-attention with relative positions.

    Scoring follows Transformer-XL (content term (q+u)·k, position term
    (q+w)·R[d]) but without causal masking or segment memory — ASR
    encoders attend both directions.

    ``use_flash`` folds the position term into the q·k product itself
    (the sinusoidal rel-pos score is exactly separable — see
    ops/flash_relpos.py) and runs the custom Pallas flash kernel over
    the augmented heads: scores equal ``(ac + bd) * scale`` below
    identically, but NOTHING quadratic in T is materialized — not the
    (B,H,T,2T-1) table score, not the round-4 ab bias, and not the
    content/softmax tensors (queue14 measured the XLA chain at 76% of
    the M-scale block). Attention-WEIGHT dropout is skipped on this
    path (the kernel has none; the block retains its attention-output
    dropout, and queue13 measured the weight-dropout term at ~4% of
    block throughput). Off-TPU the flag falls back to the plain path
    bit-for-bit.
    """
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, train: bool):
        B, T, D = x.shape
        H = self.num_heads
        Dh = D // H

        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, Dh), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        q = dense("q")(x)                                   # (B, T, H, Dh)
        k = dense("k")(x)
        v = dense("v")(x)

        u = self.param("u_bias", nn.initializers.zeros, (H, Dh),
                       jnp.float32).astype(self.dtype)
        w = self.param("w_bias", nn.initializers.zeros, (H, Dh),
                       jnp.float32).astype(self.dtype)
        # 2T-1 distances: row r of the ORIGINAL table encodes distance
        # d = r - (T-1), d = i - j for query i, key j. The table is
        # consumed in REVERSED row order so the position term can be
        # aligned with the pad-reshape relative shift below instead of
        # a (B,H,T,T) take_along_axis gather — the gather dominated the
        # M-scale block at 73% (scripts/probe_conformer_breakdown.py);
        # both forms are exact, this one is reshapes + a slice.
        r_mod = nn.DenseGeneral((H, Dh), use_bias=False, dtype=self.dtype,
                                param_dtype=jnp.float32, name="r")

        scale = 1.0 / np.sqrt(Dh)
        from ..ops import flash_relpos as _fr
        flash = self.use_flash and (jax.default_backend() == "tpu"
                                    or _fr.FORCE_INTERPRET)
        if flash:
            # recover the raw (D, H, Dh) projection kernel — applying
            # the module to I_D keeps the param tree identical to the
            # XLA path (checkpoints swap freely between the two)
            K_r = r_mod(jnp.eye(D, dtype=self.dtype))
            ctx = _rel_flash_attend(q + u, q + w, k, v, K_r, pad_mask,
                                    scale)
            return nn.DenseGeneral(D, axis=(-2, -1), use_bias=False,
                                   dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   name="out")(ctx)
        r = r_mod(rel_pos_embedding(2 * T - 1, D)[::-1]
                  .astype(self.dtype))                      # (2T-1, H, Dh)
        ac = jnp.einsum("bthd,bkhd->bhtk", q + u, k)
        pos_score = jnp.einsum("bthd,rhd->bhtr", q + w, r)  # (B,H,T,2T-1)
        # relative shift: with the reversed table, bd[t, j] must read
        # pos_score[t, j + (T-1-t)]; pad one leading column, view the
        # trailing (T, 2T) as (2T, T), drop the first row, re-view as
        # (T, 2T-1) and keep the first T columns — an exact skew
        # (Transformer-XL appendix B, bidirectional variant)
        ps = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
        ps = ps.reshape(B, H, 2 * T, T)[:, :, 1:, :]
        bd = ps.reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
        logits = (ac + bd).astype(jnp.float32) * scale
        logits = jnp.where(pad_mask[:, None, None, :], logits, NEG_INF)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = Dropout(rate=self.dropout,
                          deterministic=not train)(weights)
        out = jnp.einsum("bhtk,bkhd->bthd", weights.astype(self.dtype), v)
        return nn.DenseGeneral(D, axis=(-2, -1), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="out")(out)


class _FFN(nn.Module):
    """LN → expand → swish → dropout → project → dropout."""
    expansion: int
    dropout: float
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        D = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(D * self.expansion, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ff1")(h)
        h = jax.nn.swish(h)
        h = Dropout(rate=self.dropout, deterministic=not train)(h)
        h = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ff2")(h)
        return Dropout(rate=self.dropout, deterministic=not train)(h)


class _ConvModule(nn.Module):
    """LN → pointwise(2D)+GLU → depthwise(k) → norm → swish → pointwise.

    Params are declared explicitly (not via nn.Conv/nn.LayerNorm
    submodules) so the same weight tree serves two interchangeable
    compute paths: the XLA graph below, and — with ``fused=True`` on a
    TPU backend — the single fused Pallas kernel in
    `ops/conformer_pallas.py` that keeps the whole chain in VMEM
    (the conv module is the VPU/norm-bound part of the block at the
    M scale; see that module's docstring for the measured motivation).
    Initializer distributions match the flax submodules they replaced:
    lecun_normal over the same fan shapes, zeros/ones for biases and
    norm scales. Dropout stays outside both paths (same RNG stream).
    """
    kernel_size: int
    dropout: float
    norm: str
    dtype: Any
    fused: bool = False

    @nn.compact
    def __call__(self, x, lengths, train: bool):
        D = x.shape[-1]
        k = self.kernel_size
        init = nn.initializers.lecun_normal()
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        ln1_s = self.param("ln1_scale", ones, (D,), jnp.float32)
        ln1_b = self.param("ln1_bias", zeros, (D,), jnp.float32)
        w1 = self.param("pw1_kernel", init, (D, 2 * D), jnp.float32)
        b1 = self.param("pw1_bias", zeros, (2 * D,), jnp.float32)
        wd = self.param("dw_kernel", init, (k, D), jnp.float32)
        bd = self.param("dw_bias", zeros, (D,), jnp.float32)
        w2 = self.param("pw2_kernel", init, (D, D), jnp.float32)
        b2 = self.param("pw2_bias", zeros, (D,), jnp.float32)
        if self.norm != "batch_norm":
            ln2_s = self.param("ln2_scale", ones, (D,), jnp.float32)
            ln2_b = self.param("ln2_bias", zeros, (D,), jnp.float32)

        from ..ops import conformer_pallas as cp
        if (self.fused and self.norm != "batch_norm"
                and cp.supported(x.shape, k,
                                 interpret=cp.FORCE_INTERPRET)):
            h = cp.conformer_conv_module(
                x, lengths, ln1_s, ln1_b, w1, b1, wd, bd, ln2_s, ln2_b,
                w2, b2, interpret=cp.FORCE_INTERPRET)
            return Dropout(rate=self.dropout,
                           deterministic=not train)(h)

        def _ln(v, scale, bias):
            v32 = v.astype(jnp.float32)
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean(v32 * v32, axis=-1, keepdims=True) - mu * mu
            out = (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
            return out.astype(self.dtype)

        h = _ln(x, ln1_s, ln1_b)
        h = jnp.einsum("btd,df->btf", h, w1.astype(self.dtype)) + \
            b1.astype(self.dtype)
        h = nn.glu(h, axis=-1)
        # padded frames must not leak through the depthwise receptive
        # field (and, for batch_norm, into the batch statistics)
        h = _mask_time(h, lengths)
        h = jax.lax.conv_general_dilated(
            h, wd.astype(self.dtype)[:, None, :],
            window_strides=(1,), padding="SAME", feature_group_count=D,
            dimension_numbers=("NWC", "WIO", "NWC")) + \
            bd.astype(self.dtype)
        if self.norm == "batch_norm":
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(h)
        else:
            h = _ln(h, ln2_s, ln2_b)
        h = jax.nn.swish(h)
        h = jnp.einsum("btd,df->btf", h, w2.astype(self.dtype)) + \
            b2.astype(self.dtype)
        return Dropout(rate=self.dropout, deterministic=not train)(h)


class ConformerBlock(nn.Module):
    num_heads: int
    conv_kernel_size: int
    ffn_expansion: int
    dropout: float
    attention_dropout: float
    conv_norm: str
    dtype: Any
    fused_conv: bool = False
    flash_attention: bool = False

    @nn.compact
    def __call__(self, x, lengths, pad_mask, train: bool):
        x = x + 0.5 * _FFN(self.ffn_expansion, self.dropout, self.dtype,
                           name="ffn1")(x, train)
        attn_in = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                               name="attn_ln")(x)
        attn = RelPosSelfAttention(
            num_heads=self.num_heads, dropout=self.attention_dropout,
            dtype=self.dtype, use_flash=self.flash_attention,
            name="attn")(attn_in, pad_mask, train)
        x = x + Dropout(rate=self.dropout, deterministic=not train)(attn)
        x = x + _ConvModule(self.conv_kernel_size, self.dropout,
                            self.conv_norm, self.dtype,
                            fused=self.fused_conv,
                            name="conv")(x, lengths, train)
        x = x + 0.5 * _FFN(self.ffn_expansion, self.dropout, self.dtype,
                           name="ffn2")(x, train)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="final_ln")(x)


class ConformerNet(nn.Module):
    num_layers: int
    hidden_size: int
    num_heads: int
    conv_kernel_size: int
    ffn_expansion: int
    subsampling_channels: int
    dropout: float
    attention_dropout: float
    conv_norm: str
    dtype_: Any
    fused_conv: bool = False
    flash_attention: bool = False

    @nn.compact
    def __call__(self, feats, lengths, train: bool):
        # conv subsampling: (B, T, F) → (B, T/4, D), 4x time reduction
        x = feats.astype(self.dtype_)[..., None]            # (B, T, F, 1)
        C = self.subsampling_channels
        for i in range(2):
            x = nn.Conv(C, kernel_size=(3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype_,
                        param_dtype=jnp.float32,
                        name=f"sub_conv{i + 1}")(x)
            x = jax.nn.swish(x)
            lengths = _out_length(lengths, 2)
        B, T, Fr, _ = x.shape
        x = x.reshape(B, T, Fr * C)
        x = nn.Dense(self.hidden_size, dtype=self.dtype_,
                     param_dtype=jnp.float32, name="sub_proj")(x)
        x = Dropout(rate=self.dropout, deterministic=not train)(x)

        pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
        for i in range(self.num_layers):
            x = ConformerBlock(
                num_heads=self.num_heads,
                conv_kernel_size=self.conv_kernel_size,
                ffn_expansion=self.ffn_expansion,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                conv_norm=self.conv_norm,
                dtype=self.dtype_,
                fused_conv=self.fused_conv,
                flash_attention=self.flash_attention,
                name=f"block{i}")(x, lengths, pad_mask, train)
            # model-level remat="blocks" saves only these activations
            x = checkpoint_name(x, "block_boundary")
        x = _mask_time(x, lengths)
        return x, lengths


class ConformerEncoder(Encoder):
    """Config wrapper; schema style mirrors :class:`TDNNEncoder`."""

    @staticmethod
    def get_required_params():
        return dict(Encoder.get_required_params(), **{
            "num_layers": int,
            "hidden_size": int,
            "num_heads": int,
        })

    @staticmethod
    def get_optional_params():
        return dict(Encoder.get_optional_params(), **{
            "conv_kernel_size": int,        # depthwise kernel (paper: 31)
            "ffn_expansion": int,           # macaron FFN width multiple
            "subsampling_channels": int,    # front-end conv channels
            "dropout_keep_prob": float,
            "attention_dropout_keep_prob": float,
            "conv_norm": ["layer_norm", "batch_norm"],
            # single fused Pallas kernel for the conv module (VMEM-
            # resident LN->pw1->GLU->dwconv->LN->swish->pw2; TPU only,
            # layer_norm only — silently uses the XLA path elsewhere)
            "fused_conv_module": bool,
            "flash_attention": bool,
        })

    def make_module(self):
        p = self._params
        net = ConformerNet(
            num_layers=p["num_layers"],
            hidden_size=p["hidden_size"],
            num_heads=p["num_heads"],
            conv_kernel_size=p.get("conv_kernel_size", 31),
            ffn_expansion=p.get("ffn_expansion", 4),
            subsampling_channels=p.get("subsampling_channels",
                                       p["hidden_size"] // 4),
            dropout=1.0 - p.get("dropout_keep_prob", 0.9),
            attention_dropout=1.0 - p.get(
                "attention_dropout_keep_prob",
                p.get("dropout_keep_prob", 0.9)),
            conv_norm=p.get("conv_norm", "layer_norm"),
            dtype_=self.compute_dtype,
            fused_conv=p.get("fused_conv_module", False),
            flash_attention=p.get("flash_attention", False),
        )

        class ConformerEncoderModule(nn.Module):
            net: nn.Module

            @nn.compact
            def __call__(self, input_dict: Dict[str, Any], train: bool):
                x, lengths = input_dict["source_tensors"][:2]
                outputs, out_len = self.net(x, lengths, train)
                return {"outputs": outputs, "src_length": out_len}

        return ConformerEncoderModule(net=net)
