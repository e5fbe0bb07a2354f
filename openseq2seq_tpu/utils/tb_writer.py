"""Minimal TensorBoard event-file writer, dependency-free.

The reference logs train loss / lr / grad norms / eval metrics as TF
summaries (`open_seq2seq/models/model.py:526-532`,
`utils/hooks.py:120-190`). This environment has no TensorFlow, so this
module hand-encodes the TFRecord framing (length + masked-CRC32C) and
the Event/Summary protobuf wire format for scalar summaries — enough
for TensorBoard to read loss/lr/metric curves.

Wire format (protobuf):
  Event:  1=wall_time(double) 2=step(int64) 3=file_version(bytes)
          5=summary(Summary)
  Summary: 1=repeated Value;  Value: 1=tag(string) 2=simple_value(float)
"""
from __future__ import annotations

import os
import struct
import time
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven
# ---------------------------------------------------------------------------
_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf encoding helpers
# ---------------------------------------------------------------------------
def _varint(n: int) -> bytes:
    out = b""
    while True:
        bits = n & 0x7F
        n >>= 7
        if n:
            out += bytes([bits | 0x80])
        else:
            return out + bytes([bits])


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3) + _varint(value)


def _field_double(num: int, value: float) -> bytes:
    return _varint(num << 3 | 1) + struct.pack("<d", value)


def _field_float(num: int, value: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", value)


def _field_bytes(num: int, data: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(data)) + data


def _encode_event(step: Optional[int] = None,
                  scalars: Optional[Dict[str, float]] = None,
                  file_version: Optional[str] = None) -> bytes:
    body = _field_double(1, time.time())
    if step is not None:
        body += _field_varint(2, int(step))
    if file_version is not None:
        body += _field_bytes(3, file_version.encode())
    if scalars:
        values = b""
        for tag, value in scalars.items():
            v = _field_bytes(1, tag.encode()) + _field_float(2,
                                                             float(value))
            values += _field_bytes(1, v)
        body += _field_bytes(5, values)
    return body


class SummaryWriter:
    """Append-only scalar summary writer; one events file per run."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.{}.os2s".format(int(time.time()))
        self._path = os.path.join(logdir, fname)
        self._f = open(self._path, "ab")
        self._write_record(_encode_event(file_version="brain.Event:2"))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))
        self._f.flush()

    def add_scalars(self, step: int, scalars: Dict[str, float]):
        clean = {k: float(v) for k, v in scalars.items()
                 if _is_scalar(v)}
        if clean:
            self._write_record(_encode_event(step=step, scalars=clean))

    def add_image(self, step: int, tag: str, png: bytes,
                  height: int, width: int):
        value = _field_bytes(1, _encode_image_value(tag, png, height,
                                                    width))
        body = (_field_double(1, time.time()) +
                _field_varint(2, int(step)) +
                _field_bytes(5, value))
        self._write_record(body)

    def add_histogram(self, step: int, tag: str, values):
        """HistogramProto summary (reference logs variable/gradient
        histograms when `summaries` includes 'variables'/'gradients',
        `models/model.py` summary setup)."""
        value = _field_bytes(1, _encode_histogram_value(tag, values))
        body = (_field_double(1, time.time()) +
                _field_varint(2, int(step)) +
                _field_bytes(5, value))
        self._write_record(body)

    def add_audio(self, step: int, tag: str, samples, sample_rate: int):
        """Audio summary from a float waveform in [-1, 1] (the reference's
        Tacotron/WaveNet tf.summary.audio of eval synthesis)."""
        wav = encode_wav(samples, sample_rate)
        audio = (_field_float(1, float(sample_rate)) +
                 _field_varint(2, 1) +
                 _field_varint(3, len(samples)) +
                 _field_bytes(4, wav) +
                 _field_bytes(5, b"audio/wav"))
        value = _field_bytes(
            1, _field_bytes(1, tag.encode()) + _field_bytes(6, audio))
        body = (_field_double(1, time.time()) +
                _field_varint(2, int(step)) +
                _field_bytes(5, value))
        self._write_record(body)

    def close(self):
        self._f.close()

    @property
    def path(self):
        return self._path


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


# ---------------------------------------------------------------------------
# reader (for tests / quick inspection)
# ---------------------------------------------------------------------------
def read_events(path: str):
    """Parse an events file back into [(step, {tag: value})]."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            f.read(4)
            data = f.read(length)
            f.read(4)
            step, scalars = _parse_event(data)
            if scalars:
                out.append((step, scalars))
    return out


def _parse_event(data: bytes):
    i, step, scalars = 0, 0, {}
    while i < len(data):
        key, i = _read_varint(data, i)
        num, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _read_varint(data, i)
            if num == 2:
                step = val
        elif wt == 1:
            i += 8
        elif wt == 5:
            i += 4
        elif wt == 2:
            ln, i = _read_varint(data, i)
            chunk = data[i:i + ln]
            i += ln
            if num == 5:
                scalars.update(_parse_summary(chunk))
    return step, scalars


def _parse_summary(data: bytes):
    i, out = 0, {}
    while i < len(data):
        key, i = _read_varint(data, i)
        if key >> 3 == 1 and key & 7 == 2:
            ln, i = _read_varint(data, i)
            tag, val = _parse_value(data[i:i + ln])
            i += ln
            if tag is not None and val is not None:
                out[tag] = val
        else:
            break
    return out


def _parse_value(data: bytes):
    i, tag, val = 0, None, None
    while i < len(data):
        key, i = _read_varint(data, i)
        num, wt = key >> 3, key & 7
        if num == 1 and wt == 2:
            ln, i = _read_varint(data, i)
            tag = data[i:i + ln].decode()
            i += ln
        elif num == 2 and wt == 5:
            (val,) = struct.unpack("<f", data[i:i + 4])
            i += 4
        elif wt == 0:
            _, i = _read_varint(data, i)
        elif wt == 2:
            ln, i = _read_varint(data, i)
            i += ln
        else:
            break
    return tag, val


def _read_varint(data: bytes, i: int):
    result, shift = 0, 0
    while True:
        b = data[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _encode_image_value(tag: str, png: bytes, height: int,
                        width: int) -> bytes:
    """Summary.Value with an Image (field 4): Image {1:h 2:w 3:colorspace
    4:encoded_image_string}."""
    img = (_field_varint(1, height) + _field_varint(2, width) +
           _field_varint(3, 4) + _field_bytes(4, png))
    return _field_bytes(1, tag.encode()) + _field_bytes(4, img)


def _packed_doubles(num: int, values) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in values)
    return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _encode_histogram_value(tag: str, values) -> bytes:
    """Summary.Value with HistogramProto (field 5): {1:min 2:max 3:num
    4:sum 5:sum_squares 6:bucket_limit[] 7:bucket[]} using TensorBoard's
    exponential bucketing."""
    import numpy as np

    v = np.asarray(values, np.float64).ravel()
    if v.size == 0:
        v = np.zeros((1,), np.float64)
    # exponential bucket edges, as tf.summary.histogram uses
    limits = [1e-12]
    while limits[-1] < 1e20:
        limits.append(limits[-1] * 1.1)
    edges = np.asarray([-x for x in reversed(limits)] + [0.0] + limits)
    counts, _ = np.histogram(v, bins=np.concatenate(
        [[-np.inf], edges, [np.inf]]))
    # drop empty tail buckets; keep at least one
    nz = np.nonzero(counts)[0]
    hi = int(nz[-1]) + 1 if nz.size else 1
    lo = int(nz[0]) if nz.size else 0
    bucket_limits = np.concatenate([edges, [np.inf]])[lo:hi]
    buckets = counts[lo:hi]
    histo = (_field_double(1, float(v.min())) +
             _field_double(2, float(v.max())) +
             _field_double(3, float(v.size)) +
             _field_double(4, float(v.sum())) +
             _field_double(5, float((v * v).sum())) +
             _packed_doubles(6, bucket_limits) +
             _packed_doubles(7, buckets))
    return _field_bytes(1, tag.encode()) + _field_bytes(5, histo)


def encode_wav(samples, sample_rate: int) -> bytes:
    """PCM16 mono WAV from a float waveform in [-1, 1] — replaces the
    reference's scipy.io.wavfile use in `utils/utils.py` save paths."""
    import numpy as np

    x = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" +
           b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16) +
           b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def plot_to_png(matrix, xlabel: str = "", ylabel: str = "") -> tuple:
    """Render a 2-D array (e.g. an attention alignment) to PNG bytes via
    matplotlib (agg backend). Returns (png_bytes, height, width)."""
    import io as _io

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    ax.imshow(matrix, aspect="auto", origin="lower",
              interpolation="nearest")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    buf = _io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight")
    plt.close(fig)
    png = buf.getvalue()
    return png, 400, 600
