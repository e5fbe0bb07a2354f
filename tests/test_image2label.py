"""Image classification track: CIFAR data layer + ResNet/CNN encoders +
Image2Label metrics, with a convergence run on synthetic separable data."""
import os

import numpy as np
import pytest

from openseq2seq_tpu.data.image2label import CifarDataLayer
from openseq2seq_tpu.decoders import FullyConnectedDecoder
from openseq2seq_tpu.encoders import CNNEncoder, ResNetEncoder
from openseq2seq_tpu.losses import CrossEntropyLoss
from openseq2seq_tpu.models import Image2Label
from openseq2seq_tpu.training import trainer


@pytest.fixture(scope="module")
def fake_cifar(tmp_path_factory):
    """Synthetic CIFAR-format data where class k is a horizontal stripe
    pattern of period 2^(k+1) — invariant to the layer's flip/crop
    augmentation and to per-image standardization."""
    out = tmp_path_factory.mktemp("cifar")
    rng = np.random.RandomState(0)
    n_per_file, n_classes = 128, 4

    def write(path, n):
        recs = []
        rows = np.arange(32)
        for _ in range(n):
            label = rng.randint(n_classes)
            period = 2 ** (label + 1)
            stripe = ((rows // (period // 2)) % 2) * 140.0 + 60.0
            img = np.broadcast_to(stripe[None, :, None],
                                  (3, 32, 32)).copy()
            img = np.clip(img + rng.randn(3, 32, 32) * 10, 0, 255)
            recs.append(np.concatenate(
                [[label], img.ravel()]).astype(np.uint8))
        np.stack(recs).tofile(str(path))

    write(out / "data_batch_1.bin", n_per_file)
    write(out / "test_batch.bin", 64)
    return str(out)


def _config(data_dir, encoder="cnn", num_epochs=3):
    if encoder == "cnn":
        enc_cls, enc_params = CNNEncoder, {
            "cnn_layers": [
                {"type": "conv2d", "filters": 8, "kernel_size": 3,
                 "strides": 2, "activation": "relu"},
                {"type": "max_pool", "pool_size": 2},
            ],
            "fc_layers": [{"type": "dense", "units": 32,
                           "activation": "relu"}],
        }
    else:
        enc_cls, enc_params = ResNetEncoder, {
            "resnet_size": 18,
            "first_num_filters": 8,
            "first_kernel_size": 3,
            "first_conv_stride": 1,
            "first_pool_size": 0,
            "first_pool_stride": 1,
            "block_sizes": [1, 1],
            "block_strides": [1, 2],
            "bottleneck": False,
            "version": 2,
        }
    return {
        "random_seed": 0,
        "num_epochs": num_epochs,
        "logdir": "",
        "batch_size_per_gpu": 32,
        "print_loss_steps": 4,
        "save_checkpoint_steps": None,
        "optimizer": "Momentum",
        "optimizer_params": {"learning_rate": 0.05, "momentum": 0.9},
        "encoder": enc_cls,
        "encoder_params": enc_params,
        "decoder": FullyConnectedDecoder,
        "decoder_params": {"output_dim": 4},
        "loss": CrossEntropyLoss,
        "loss_params": {},
        "data_layer": CifarDataLayer,
        "data_layer_params": {"data_dir": data_dir, "num_classes": 4},
    }


def test_cifar_data_layer_reads_binary(fake_cifar):
    model = Image2Label(params=_config(fake_cifar), mode="train")
    dl = model.get_data_layer()
    assert dl.get_size_in_samples() == 128
    batch = next(iter(dl.iterate_one_epoch()))
    x = batch["source_tensors"][0]
    assert x.shape == (32, 32, 32, 3)
    assert batch["target_tensors"][0].shape == (32,)
    assert x.dtype == np.float32


@pytest.mark.slow
def test_cnn_convergence_and_top1(fake_cifar):
    model = Image2Label(params=_config(fake_cifar, "cnn", num_epochs=10),
                        mode="train")
    result = trainer.train(model)
    eval_cfg = _config(fake_cifar, "cnn")
    eval_cfg["data_layer_params"]["shuffle"] = False
    eval_model = Image2Label(params=eval_cfg, mode="eval")
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval top-1"] > 0.9, metrics


def test_resnet_forward(fake_cifar):
    import jax
    model = Image2Label(params=_config(fake_cifar, "resnet"), mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_image2label_metrics_math():
    model_params = None
    # pure metric check without building a model
    from openseq2seq_tpu.models.image2label import Image2Label as M
    results = [(3, 4, 4, 2.0), (2, 4, 4, 4.0)]
    metrics = M.finalize_evaluation(object.__new__(M), results)
    assert metrics["Eval top-1"] == pytest.approx(5 / 8)
    assert metrics["Eval top-5"] == pytest.approx(1.0)
