"""Recurrent layers as `lax.scan` kernels.

The reference leans on cuDNN fused RNNs (`encoders/ds2_encoder.py:
294-325`, `encoders/rnn_encoders.py:485-637`); the TPU equivalent is a
scan whose per-step work is only the small recurrent matmul:

  * the input projection for ALL timesteps is hoisted out of the loop
    into one large (B*T, D) x (D, 4H) matmul that the MXU loves;
  * the scan body does just h @ U + elementwise gates — XLA keeps it
    fused and on-chip;
  * padding is handled by freezing the carry where the mask is 0, so a
    bidirectional pass is "flip, run, flip back" with leading padding
    leaving the initial carry untouched (no per-example gather).

Variational (recurrent) dropout and zoneout hooks are carried per layer
for the LM/Tacotron tracks.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# process-global, bound per trace by the model (same pattern and
# rationale as parts/dropout.dropout_config): ``fused_rnn: True``
# routes eligible forward LSTMs through the fused Pallas scan kernel
# (ops/lstm_pallas.py) — opt-in, TPU-only via its supported() gate.
_FUSED_RNN = False


def set_fused_rnn(on: bool) -> None:
    global _FUSED_RNN
    _FUSED_RNN = bool(on)


def get_fused_rnn() -> bool:
    return _FUSED_RNN


@contextmanager
def fused_rnn_config(on: bool):
    global _FUSED_RNN
    prev = _FUSED_RNN
    _FUSED_RNN = bool(on)
    try:
        yield
    finally:
        _FUSED_RNN = prev


def _time_mask(lengths, T):
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)


class LSTM(nn.Module):
    """Unidirectional LSTM over (B, T, D) -> (B, T, H)."""
    hidden_size: int
    forget_bias: float = 1.0
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, initial_state: Optional[Tuple] = None):
        B, T, D = x.shape
        H = self.hidden_size
        mask = _time_mask(lengths, T)
        if self.reverse:
            x = jnp.flip(x, axis=1)
            mask = jnp.flip(mask, axis=1)

        x_proj = nn.DenseGeneral(4 * H, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name="input_proj")(x)     # (B,T,4H)
        W_h = self.param("recurrent_kernel",
                         nn.initializers.orthogonal(),
                         (H, 4 * H), jnp.float32)
        if initial_state is None:
            h0 = jnp.zeros((B, H), self.dtype)
            c0 = jnp.zeros((B, H), jnp.float32)
        else:
            h0, c0 = initial_state

        W_h_c = W_h.astype(self.dtype)

        from ...ops import lstm_pallas as lpk
        if (get_fused_rnn()
                and lpk.supported(B, T, H,
                                  interpret=lpk.FORCE_INTERPRET)):
            # whole recurrence in one Pallas kernel: W_h resident in
            # VMEM, gates/carries never leave it (the measured lever
            # for the scan-latency-bound LSTM-LM — see ops/lstm_pallas).
            # Reverse cells run over the already-flipped inputs with
            # suffix masking (valid frames sit at the end after the
            # flip).
            out, last = lpk.lstm_scan(
                x_proj, W_h, h0,
                c0.astype(jnp.float32), lengths,
                float(self.forget_bias), lpk.FORCE_INTERPRET,
                self.reverse)
            if self.reverse:
                out = jnp.flip(out, axis=1)
            out = out * _time_mask(lengths, T)[:, :, None].astype(
                out.dtype)
            return out, last

        def step(carry, inp):
            h, c = carry
            xp, m = inp
            gates = xp + h @ W_h_c
            i, f, g, o = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
            c_new = (jax.nn.sigmoid(f + self.forget_bias) * c +
                     jax.nn.sigmoid(i) * jnp.tanh(g))
            h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(self.dtype)
            m = m[:, None]
            h = h_new * m.astype(self.dtype) + h * (1 - m).astype(self.dtype)
            c = c_new * m + c * (1 - m)
            return (h, c), h

        xs = (jnp.moveaxis(x_proj, 1, 0), jnp.moveaxis(mask, 1, 0))
        (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), xs)
        out = jnp.moveaxis(ys, 0, 1)                      # (B,T,H)
        if self.reverse:
            out = jnp.flip(out, axis=1)
        out = out * _time_mask(lengths, T)[:, :, None].astype(out.dtype)
        return out, (h_last, c_last)


class GRU(nn.Module):
    """Unidirectional GRU (cuDNN-compatible gate math) over (B, T, D)."""
    hidden_size: int
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, initial_state=None):
        B, T, D = x.shape
        H = self.hidden_size
        mask = _time_mask(lengths, T)
        if self.reverse:
            x = jnp.flip(x, axis=1)
            mask = jnp.flip(mask, axis=1)

        x_proj = nn.DenseGeneral(3 * H, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name="input_proj")(x)     # r,z,n inputs
        W_h = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                         (H, 3 * H), jnp.float32)
        b_h = self.param("recurrent_bias", nn.initializers.zeros,
                         (3 * H,), jnp.float32)
        h0 = initial_state if initial_state is not None else \
            jnp.zeros((B, H), self.dtype)
        W_h_c = W_h.astype(self.dtype)

        from ...ops import gru_pallas as gpk
        if (get_fused_rnn()
                and gpk.supported(B, T, H,
                                  interpret=gpk.FORCE_INTERPRET)):
            # fused Pallas GRU scan (same design as the LSTM kernel;
            # ops/gru_pallas.py) — reverse cells use suffix masking
            # over the already-flipped inputs
            out, h_last = gpk.gru_scan(
                x_proj, W_h, b_h, h0, lengths,
                gpk.FORCE_INTERPRET, self.reverse)
            if self.reverse:
                out = jnp.flip(out, axis=1)
            out = out * _time_mask(lengths, T)[:, :, None].astype(
                out.dtype)
            return out, h_last

        def step(h, inp):
            xp, m = inp
            hp = (h @ W_h_c).astype(jnp.float32) + b_h
            xr, xz, xn = jnp.split(xp.astype(jnp.float32), 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)        # cuDNN variant: r gates h-term
            h32 = (1 - z) * n + z * h.astype(jnp.float32)
            h_new = h32.astype(self.dtype)
            m = m[:, None].astype(self.dtype)
            h = h_new * m + h * (1 - m)
            return h, h

        xs = (jnp.moveaxis(x_proj, 1, 0), jnp.moveaxis(mask, 1, 0))
        h_last, ys = jax.lax.scan(step, h0, xs)
        out = jnp.moveaxis(ys, 0, 1)
        if self.reverse:
            out = jnp.flip(out, axis=1)
        out = out * _time_mask(lengths, T)[:, :, None].astype(out.dtype)
        return out, h_last


class BiRNN(nn.Module):
    """Bidirectional wrapper: concat(forward, backward) features."""
    hidden_size: int
    cell_type: str = "lstm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        if self.cell_type in ("lstm", "cudnn_lstm", "layernorm_lstm"):
            fwd, _ = LSTM(self.hidden_size, dtype=self.dtype,
                          name="fw")(x, lengths)
            bwd, _ = LSTM(self.hidden_size, dtype=self.dtype,
                          reverse=True, name="bw")(x, lengths)
        else:
            fwd, _ = GRU(self.hidden_size, dtype=self.dtype,
                         name="fw")(x, lengths)
            bwd, _ = GRU(self.hidden_size, dtype=self.dtype,
                         reverse=True, name="bw")(x, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)


def make_rnn(cell_type: str, hidden_size: int, unidirectional: bool,
             dtype, name: str):
    """Factory matching the reference's rnn_type strings
    (`ds2_encoder.py:20-35`); cudnn_* map to the same scan kernels."""
    if unidirectional:
        if cell_type in ("lstm", "cudnn_lstm", "layernorm_lstm"):
            return LSTM(hidden_size, dtype=dtype, name=name)
        if cell_type in ("gru", "cudnn_gru"):
            return GRU(hidden_size, dtype=dtype, name=name)
        raise ValueError("not supported rnn type: {}".format(cell_type))
    return BiRNN(hidden_size, cell_type=cell_type, dtype=dtype, name=name)


class GLSTM(nn.Module):
    """Group LSTM (reference `parts/rnns/utils.py` GLSTMCell, from
    Kuchaiev & Ginsburg "Factorization Tricks for LSTM Networks"):
    input and hidden state are split into ``num_groups`` slices, each
    running an independent LSTM — parameter count and recurrent matmul
    shrink by ~1/G while keeping the same width."""
    hidden_size: int
    num_groups: int = 4
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, initial_state=None):
        G = self.num_groups
        if self.hidden_size % G or x.shape[-1] % G:
            raise ValueError("hidden_size and input dim must divide "
                             "num_groups")
        outs, states = [], []
        in_slices = jnp.split(x, G, axis=-1)
        for g in range(G):
            out, st = LSTM(self.hidden_size // G, reverse=self.reverse,
                           dtype=self.dtype,
                           name="group{}".format(g + 1))(
                in_slices[g], lengths)
            outs.append(out)
            states.append(st)
        return jnp.concatenate(outs, axis=-1), states


class SLSTM(nn.Module):
    """Simplified LSTM (reference `parts/rnns/slstm.py:BasicSLSTMCell`):
    the gate pre-activations depend ONLY on the inputs — the recurrent
    term is dropped from the gate matmul — so the whole gate computation
    hoists out of the scan as one batched matmul; the recursion is just
    the elementwise cell-state update (very TPU-friendly)."""
    hidden_size: int
    forget_bias: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, initial_state: Optional[Tuple] = None):
        B, T, D = x.shape
        H = self.hidden_size
        mask = _time_mask(lengths, T)
        gates = nn.DenseGeneral(4 * H, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="input_proj")(x)      # (B,T,4H)
        if initial_state is None:
            h0 = jnp.zeros((B, H), self.dtype)
            c0 = jnp.zeros((B, H), jnp.float32)
        else:
            h0, c0 = initial_state

        def step(carry, inp):
            h, c = carry
            g, m = inp
            i, j, f, o = jnp.split(g.astype(jnp.float32), 4, axis=-1)
            c_new = (c * jax.nn.sigmoid(f + self.forget_bias) +
                     jax.nn.sigmoid(i) * jnp.tanh(j))
            h_new = (jnp.tanh(c_new) * jax.nn.sigmoid(o)).astype(self.dtype)
            m = m[:, None]
            h = h_new * m.astype(self.dtype) + h * (1 - m).astype(self.dtype)
            c = c_new * m + c * (1 - m)
            return (h, c), h

        xs = (jnp.moveaxis(gates, 1, 0), jnp.moveaxis(mask, 1, 0))
        (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), xs)
        out = jnp.moveaxis(ys, 0, 1)
        out = out * _time_mask(lengths, T)[:, :, None].astype(out.dtype)
        return out, (h_last, c_last)


class FLSTM(nn.Module):
    """Factorized LSTM (reference `parts/rnns/flstm.py:FLSTMCell`,
    Kuchaiev & Ginsburg ICLR'17): [x, h] -> bias-free bottleneck of
    ``fact_size`` -> 4H gates; optional output projection to
    ``num_proj``. The input half of the bottleneck matmul hoists out of
    the scan."""
    hidden_size: int
    fact_size: int
    num_proj: int = 0
    forget_bias: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, initial_state: Optional[Tuple] = None):
        B, T, D = x.shape
        H = self.hidden_size
        F = self.fact_size
        out_dim = self.num_proj or H
        mask = _time_mask(lengths, T)

        x_fact = nn.DenseGeneral(F, use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name="first_gemm_x")(x)   # (B,T,F)
        W1h = self.param("first_gemm_h", nn.initializers.orthogonal(),
                         (out_dim, F), jnp.float32)
        W2 = self.param("second_gemm", nn.initializers.xavier_uniform(),
                        (F, 4 * H), jnp.float32)
        b2 = self.param("second_gemm_bias", nn.initializers.zeros,
                        (4 * H,), jnp.float32)
        W_proj = None
        if self.num_proj:
            W_proj = self.param("projection",
                                nn.initializers.xavier_uniform(),
                                (H, self.num_proj), jnp.float32)
        if initial_state is None:
            h0 = jnp.zeros((B, out_dim), self.dtype)
            c0 = jnp.zeros((B, H), jnp.float32)
        else:
            h0, c0 = initial_state
        W1h_c = W1h.astype(self.dtype)
        W2_c = W2.astype(self.dtype)

        def step(carry, inp):
            h, c = carry
            xf, m = inp
            fact = xf + h @ W1h_c
            gates = (fact @ W2_c).astype(jnp.float32) + b2
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            c_new = (jax.nn.sigmoid(f + self.forget_bias) * c +
                     jax.nn.sigmoid(i) * jnp.tanh(j))
            m_out = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            if W_proj is not None:
                m_out = m_out @ W_proj
            h_new = m_out.astype(self.dtype)
            mm = m[:, None]
            h = h_new * mm.astype(self.dtype) + h * (1 - mm).astype(self.dtype)
            c = c_new * mm + c * (1 - mm)
            return (h, c), h

        xs = (jnp.moveaxis(x_fact, 1, 0), jnp.moveaxis(mask, 1, 0))
        (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), xs)
        out = jnp.moveaxis(ys, 0, 1)
        out = out * _time_mask(lengths, T)[:, :, None].astype(out.dtype)
        return out, (h_last, c_last)


class LayerNormLSTM(nn.Module):
    """Layer-norm LSTM with optional DropConnect on the recurrent
    kernel (reference ``WeightDropLayerNormBasicLSTMCell``, used by the
    AWD LM/transfer configs): each gate's pre-activation is layer-
    normalized; when training, a single recurrent-weight dropout mask is
    sampled per call (DropConnect), matching the AWD-LSTM recipe."""
    hidden_size: int
    forget_bias: float = 1.0
    recurrent_weight_keep_prob: float = 1.0
    norm_epsilon: float = 1e-6
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x, lengths, initial_state: Optional[Tuple] = None):
        B, T, D = x.shape
        H = self.hidden_size
        mask = _time_mask(lengths, T)
        # bias-free input projection: LN adds the offset
        x_proj = nn.DenseGeneral(4 * H, use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name="input_proj")(x)
        W_h = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                         (H, 4 * H), jnp.float32)
        ln_scale = self.param("ln_scale", nn.initializers.ones,
                              (4, H), jnp.float32)
        ln_bias = self.param("ln_bias", nn.initializers.zeros,
                             (4, H), jnp.float32)
        keep = self.recurrent_weight_keep_prob
        if self.train and keep < 1.0:
            drop_rng = self.make_rng("dropout")
            wmask = jax.random.bernoulli(drop_rng, keep, W_h.shape)
            W_h = jnp.where(wmask, W_h / keep, 0.0)
        W_h_c = W_h.astype(self.dtype)
        if initial_state is None:
            h0 = jnp.zeros((B, H), self.dtype)
            c0 = jnp.zeros((B, H), jnp.float32)
        else:
            h0, c0 = initial_state

        def ln(v, idx):
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
            v = (v - mu) * jax.lax.rsqrt(var + self.norm_epsilon)
            return v * ln_scale[idx] + ln_bias[idx]

        def step(carry, inp):
            h, c = carry
            xp, m = inp
            gates = (xp + h @ W_h_c).astype(jnp.float32)
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            i, j, f, o = ln(i, 0), ln(j, 1), ln(f, 2), ln(o, 3)
            c_new = (jax.nn.sigmoid(f + self.forget_bias) * c +
                     jax.nn.sigmoid(i) * jnp.tanh(j))
            h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(self.dtype)
            mm = m[:, None]
            h = h_new * mm.astype(self.dtype) + h * (1 - mm).astype(self.dtype)
            c = c_new * mm + c * (1 - mm)
            return (h, c), h

        xs = (jnp.moveaxis(x_proj, 1, 0), jnp.moveaxis(mask, 1, 0))
        (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), xs)
        out = jnp.moveaxis(ys, 0, 1)
        out = out * _time_mask(lengths, T)[:, :, None].astype(out.dtype)
        return out, (h_last, c_last)


class TemporalConvolutionalLayer(nn.Module):
    """Causal (left-padded) 1-D convolution (reference
    `parts/cnns/tcn.py:8`): pads (kernel-1)*dilation zeros on the left
    so output t sees inputs <= t only."""
    filters: int
    kernel_size: int
    strides: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pads = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pads, 0), (0, 0)))
        return nn.Conv(self.filters, (self.kernel_size,),
                       strides=(self.strides,),
                       kernel_dilation=(self.dilation,),
                       padding="VALID", use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)
