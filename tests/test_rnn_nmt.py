"""GNMT-style RNN NMT track (reference
`models/text2text_test.py` BasicText2TextWithAttention tests)."""
import numpy as np
import pytest

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import (BeamSearchRNNDecoderWithAttention,
                                      RNNDecoderWithAttention)
from openseq2seq_tpu.encoders import (BidirectionalRNNEncoderWithEmbedding,
                                      GNMTLikeEncoderWithEmbedding,
                                      UnidirectionalRNNEncoderWithEmbedding)
from openseq2seq_tpu.losses import BasicSequenceLoss
from openseq2seq_tpu.models import Text2Text
from openseq2seq_tpu.test_utils import toy_nmt
from openseq2seq_tpu.training import trainer


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    return toy_nmt.generate(str(tmp_path_factory.mktemp("toy_rnn_nmt")))


def _config(data, encoder_cls, attention_type="bahdanau",
            decoder_cls=RNNDecoderWithAttention, num_epochs=2,
            files="train", **dec_extra):
    H = 64
    return {
        "random_seed": 0,
        "num_epochs": num_epochs,
        "logdir": "",
        "batch_size_per_gpu": 32,
        "print_loss_steps": 50,
        "save_checkpoint_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 2e-3},
        "max_grad_norm": 3.0,
        "encoder": encoder_cls,
        "encoder_params": {
            "src_vocab_size": 14,
            "src_emb_size": H,
            "core_cell": "lstm",
            "core_cell_params": {"num_units": H},
            "encoder_layers": 2,
            "encoder_use_skip_connections": False,
        },
        "decoder": decoder_cls,
        "decoder_params": dict({
            "GO_SYMBOL": 2,
            "END_SYMBOL": 1,
            "tgt_emb_size": H,
            "attention_layer_size": H,
            "attention_type": attention_type,
            "core_cell": "lstm",
            "core_cell_params": {"num_units": H},
            "decoder_layers": 2,
            "decoder_use_skip_connections": False,
        }, **dec_extra),
        "loss": BasicSequenceLoss,
        "loss_params": {"average_across_timestep": True},
        "data_layer": ParallelTextDataLayer,
        "data_layer_params": {
            "source_file": data["{}_src".format(files)],
            "target_file": data["{}_tgt".format(files)],
            "src_vocab_file": data["vocab"],
            "tgt_vocab_file": data["vocab"],
            "max_length": 16,
            "shuffle": files == "train",
            "repeat": True,
            "special_tokens_already_in_vocab": False,
        },
    }


@pytest.mark.parametrize("encoder_cls,attention", [
    (UnidirectionalRNNEncoderWithEmbedding, "bahdanau"),
    (BidirectionalRNNEncoderWithEmbedding, "luong"),
    (GNMTLikeEncoderWithEmbedding, "gnmt_v2"),
])
def test_rnn_nmt_single_step(toy_data, encoder_cls, attention):
    import jax
    model = Text2Text(params=_config(toy_data, encoder_cls, attention),
                      mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_gnmt_reversal_convergence(toy_data):
    cfg = _config(toy_data, GNMTLikeEncoderWithEmbedding, "gnmt_v2",
                  num_epochs=60)
    model = Text2Text(params=cfg, mode="train")
    result = trainer.train(model)
    assert float(result["last_metrics"]["loss"]) < 0.5, \
        result["last_metrics"]

    eval_cfg = _config(toy_data, GNMTLikeEncoderWithEmbedding, "gnmt_v2",
                       decoder_cls=BeamSearchRNNDecoderWithAttention,
                       files="eval", beam_width=3, length_penalty=0.6)
    eval_model = Text2Text(params=eval_cfg, mode="eval")
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval BLEU"] > 80.0, metrics


def test_weight_tied_skip_connections_step(toy_data):
    """The en-de-gnmt-like-weight-tied recipe path: tied embedding /
    output projection (reference `decoders/rnn_decoders.py` weight_tied)
    plus residual skip connections in both stacks."""
    import jax
    cfg = _config(toy_data, GNMTLikeEncoderWithEmbedding, "gnmt_v2",
                  weight_tied=True)
    cfg["encoder_params"]["encoder_use_skip_connections"] = True
    cfg["decoder_params"]["decoder_use_skip_connections"] = True
    model = Text2Text(params=cfg, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    # tied: no separate output-projection kernel over the vocab
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("tied_proj" in n for n in names), names
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_scheduled_sampling_train_step(toy_data):
    import jax
    cfg = _config(toy_data, GNMTLikeEncoderWithEmbedding, "gnmt_v2",
                  sampling_prob=0.5)
    model = Text2Text(params=cfg, mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
