"""TensorBoard event writer: TFRecord framing + Event proto roundtrip,
CRC32C correctness, trainer integration."""
import glob
import os
import struct

import numpy as np
import pytest

from openseq2seq_tpu.utils.tb_writer import (SummaryWriter, _crc32c,
                                             _masked_crc, _varint,
                                             read_events)


def test_crc32c_known_vectors():
    assert _crc32c(b"") == 0x0
    # canonical CRC32C check value
    assert _crc32c(b"123456789") == 0xE3069283
    # RFC 3720 iSCSI test vector
    assert _crc32c(bytes(range(32))) == 0x46DD794E


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"


def test_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 3.5, "lr": 0.001})
    w.add_scalars(2, {"loss": 2.5})
    w.close()
    events = read_events(w.path)
    assert events[0][0] == 1
    assert events[0][1]["loss"] == pytest.approx(3.5)
    assert events[0][1]["lr"] == pytest.approx(0.001, rel=1e-4)
    assert events[1] == (2, {"loss": 2.5})


def test_record_framing_crcs(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars(5, {"x": 1.0})
    w.close()
    with open(w.path, "rb") as f:
        raw = f.read()
    header = raw[:8]
    (length,) = struct.unpack("<Q", header)
    (crc_header,) = struct.unpack("<I", raw[8:12])
    assert crc_header == _masked_crc(header)
    data = raw[12:12 + length]
    (crc_data,) = struct.unpack("<I", raw[12 + length:16 + length])
    assert crc_data == _masked_crc(data)


def test_trainer_writes_summaries(toy_speech_data, tmp_path):
    from openseq2seq_tpu.models import Speech2Text
    from openseq2seq_tpu.test_utils.test_speech_configs import \
        w2l_test_config
    from openseq2seq_tpu.training import trainer
    logdir = str(tmp_path / "logs")
    base_params, _ = w2l_test_config(toy_speech_data["csv"],
                                     toy_speech_data["vocab"],
                                     logdir=logdir, num_epochs=4)
    base_params["save_summaries_steps"] = 2
    base_params["save_checkpoint_steps"] = None
    model = Speech2Text(params=base_params, mode="train")
    trainer.train(model)
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert files
    events = read_events(files[0])
    assert any("train/loss" in scalars for _, scalars in events)


def test_image_summary_roundtrip(tmp_path):
    from openseq2seq_tpu.utils.tb_writer import plot_to_png
    import numpy as np
    png, h, w = plot_to_png(np.random.RandomState(0).rand(10, 20))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    wtr = SummaryWriter(str(tmp_path))
    wtr.add_image(3, "attn", png, h, w)
    wtr.close()
    # file parses without error and the scalar reader skips the image
    events = read_events(wtr.path)
    assert isinstance(events, list)


def test_histogram_summary(tmp_path):
    import numpy as np
    from openseq2seq_tpu.utils.tb_writer import _encode_histogram_value
    wtr = SummaryWriter(str(tmp_path))
    vals = np.random.RandomState(0).randn(1000)
    wtr.add_histogram(5, "w", vals)
    wtr.close()
    events = read_events(wtr.path)      # reader skips histos gracefully
    assert isinstance(events, list)
    # encoded histo carries correct count/sum stats
    import struct as _s
    enc = _encode_histogram_value("w", vals)
    # field 5 (histo) starts after tag; find num (field 3, double)
    # crude scan: all doubles in the message, one of them == len(vals)
    doubles = [(_s.unpack("<d", enc[i:i + 8])[0])
               for i in range(len(enc) - 8)]
    assert any(abs(d - 1000.0) < 1e-9 for d in doubles)


def test_audio_summary_and_wav(tmp_path):
    import numpy as np
    from openseq2seq_tpu.utils.tb_writer import encode_wav
    t = np.linspace(0, 1, 8000)
    sig = np.sin(2 * np.pi * 440 * t)
    wav = encode_wav(sig, 8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert len(wav) == 44 + 2 * len(sig)
    # sample rate in header
    import struct as _s
    assert _s.unpack("<I", wav[24:28])[0] == 8000
    wtr = SummaryWriter(str(tmp_path))
    wtr.add_audio(7, "synth", sig, 8000)
    wtr.close()
    events = read_events(wtr.path)
    assert isinstance(events, list)
