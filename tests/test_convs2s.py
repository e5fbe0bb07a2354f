"""ConvS2S NMT track."""
import numpy as np
import pytest

from openseq2seq_tpu.data.text2text import ParallelTextDataLayer
from openseq2seq_tpu.decoders import ConvS2SDecoder
from openseq2seq_tpu.encoders import ConvS2SEncoder
from openseq2seq_tpu.losses import PaddedCrossEntropyLossWithSmoothing
from openseq2seq_tpu.models import Text2Text
from openseq2seq_tpu.test_utils import toy_nmt
from openseq2seq_tpu.training import trainer


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    return toy_nmt.generate(str(tmp_path_factory.mktemp("toy_convs2s")))


def _config(data, num_epochs=2, files="train"):
    H = 64
    return {
        "random_seed": 0,
        "num_epochs": num_epochs,
        "logdir": "",
        "batch_size_per_gpu": 32,
        "print_loss_steps": 50,
        "save_checkpoint_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 1e-3},
        "max_grad_norm": 3.0,
        "encoder": ConvS2SEncoder,
        "encoder_params": {
            "src_emb_size": H,
            "src_vocab_size": 14,
            "pad_embeddings_2_eight": False,
            "conv_nchannels_kwidth": [(H, 3)] * 3,
            "embedding_dropout_keep_prob": 0.9,
            "hidden_dropout_keep_prob": 0.9,
            "max_input_length": 32,
        },
        "decoder": ConvS2SDecoder,
        "decoder_params": {
            "tgt_emb_size": H,
            "out_emb_size": H,
            "shared_embed": False,
            "conv_nchannels_kwidth": [(H, 3)] * 3,
            "embedding_dropout_keep_prob": 0.9,
            "hidden_dropout_keep_prob": 0.9,
            "out_dropout_keep_prob": 0.9,
            "beam_size": 2,
            "alpha": 0.6,
            "extra_decode_length": 4,
            "EOS_ID": 1,
            "GO_SYMBOL": 2,
            "max_input_length": 64,
        },
        "loss": PaddedCrossEntropyLossWithSmoothing,
        "loss_params": {"label_smoothing": 0.1},
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


def test_convs2s_single_step(toy_data):
    import jax
    model = Text2Text(params=_config(toy_data), mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    _, metrics = jax.jit(model.train_step)(state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_convs2s_causality(toy_data):
    """Future target tokens must not influence earlier logits."""
    import jax
    model = Text2Text(params=_config(toy_data), mode="train")
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    device_batch = jax.tree_util.tree_map(np.asarray, batch)
    variables = {"params": state.params, **state.model_state}
    out1 = model.module().apply(variables, device_batch, train=False)
    batch2 = jax.tree_util.tree_map(np.copy, device_batch)
    batch2["target_tensors"][0][:, -2:] = 9      # perturb future targets
    out2 = model.module().apply(variables, batch2, train=False)
    l1 = np.asarray(out1["decoder_output"]["logits"])[:, :3]
    l2 = np.asarray(out2["decoder_output"]["logits"])[:, :3]
    np.testing.assert_allclose(l1, l2, atol=1e-4)


@pytest.mark.slow
def test_convs2s_reversal_convergence(toy_data):
    model = Text2Text(params=_config(toy_data, num_epochs=60),
                      mode="train")
    result = trainer.train(model)
    assert float(result["last_metrics"]["loss"]) < 1.0

    eval_model = Text2Text(params=_config(toy_data, num_epochs=60,
                                          files="eval"), mode="eval")
    metrics = trainer.evaluate_with_state(eval_model, result["state"])
    assert metrics["Eval BLEU"] > 70.0, metrics
