"""Chained-step timing helper (`utils/benchmark.py`): K steps inside
one jitted fori_loop must equal K sequential jitted steps. This also
pins the TrainState pytree-stability contract (model_state stays a
plain dict across init_state and train_step) that makes train_step a
valid loop/scan body."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openseq2seq_tpu.data.synthetic import (SyntheticImageDataLayer,
                                            SyntheticLMDataLayer,
                                            SyntheticTTSDataLayer)
from openseq2seq_tpu.decoders import FakeDecoder, FullyConnectedDecoder
from openseq2seq_tpu.encoders import LMEncoder, ResNetEncoder
from openseq2seq_tpu.losses import BasicSequenceLoss, CrossEntropyLoss
from openseq2seq_tpu.models import Image2Label, LSTMLM
from openseq2seq_tpu.parallel.mesh import make_mesh, shard_batch
from openseq2seq_tpu.utils.benchmark import (make_multi_step,
                                             time_chained_steps)


@pytest.fixture(scope="module")
def tiny_resnet():
    mesh = make_mesh(num_data=1, num_model=1)
    params = {
        "random_seed": 0,
        "max_steps": 100,
        "batch_size_per_gpu": 2,
        "print_loss_steps": None,
        "optimizer": "SGD",
        "optimizer_params": {},
        "lr_policy": "fixed",
        # small lr: with batch-norm and a 2-sample batch the training
        # trajectory is chaotic, and compile-level reassociation noise
        # (~2e-6 at k=1) amplifies ~1e4x over 3 steps at lr 1e-2 —
        # drowning the structural equivalence this test is after
        "lr_policy_params": {"learning_rate": 1e-4},
        "dtype": "float32",
        "encoder": ResNetEncoder,
        "encoder_params": {"resnet_size": 18, "version": 2},
        "decoder": FullyConnectedDecoder,
        "decoder_params": {"output_dim": 10},
        "loss": CrossEntropyLoss,
        "loss_params": {},
        "data_layer": SyntheticImageDataLayer,
        "data_layer_params": {"num_classes": 10, "image_size": 32,
                              "num_batches": 2},
    }
    model = Image2Label(params=params, mode="train", mesh=mesh)
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    return model, state, shard_batch(batch, mesh)


def test_state_pytree_stable_across_train_step(tiny_resnet):
    """train_step output must have the SAME treedef as its input —
    batch-norm state must not change container type (dict vs
    FrozenDict), or lax.scan/fori_loop over the step fails."""
    model, state, batch = tiny_resnet
    new_state, _ = jax.jit(model.train_step)(
        state, batch, jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(state) ==
            jax.tree_util.tree_structure(new_state))
    # ResNet actually carries mutable batch-norm state, so the check
    # above is not vacuous
    assert jax.tree_util.tree_leaves(state.model_state)


def _copy(state):
    # make_multi_step donates its state argument; tests keep the
    # fixture alive by handing it a copy
    return jax.tree_util.tree_map(jnp.copy, state)


@pytest.fixture(scope="module")
def tiny_lm():
    """LSTM LM: smooth dynamics (no batch-norm), so chained and
    sequential trajectories stay numerically close over several steps.
    (The ResNet fixture is unusable for trajectory equivalence: BN over
    a 2-sample batch amplifies compile-level reassociation noise ~1e3x
    per forward pass — measured 1e-7 param perturbation -> 8.5e-5 loss
    change.) Dropout is ON, so this also pins identical rng threading
    between the fori_loop body and discrete steps."""
    mesh = make_mesh(num_data=1, num_model=1)
    params = {
        "random_seed": 0,
        "max_steps": 100,
        "batch_size_per_gpu": 4,
        "print_loss_steps": None,
        "optimizer": "Adam",
        "optimizer_params": {"learning_rate": 4e-3},
        "lr_policy": "fixed",
        "lr_policy_params": {"learning_rate": 4e-3},
        "max_grad_norm": 0.25,
        "dtype": "float32",
        "encoder": LMEncoder,
        "encoder_params": {
            "emb_size": 16,
            "encoder_layers": 2,
            "encoder_use_skip_connections": False,
            "core_cell": None,
            "core_cell_params": {"num_units": 32},
            "use_cudnn_rnn": False,
            "cudnn_rnn_type": None,
            "weight_tied": False,
            "encoder_emb_keep_prob": 0.9,
            "encoder_dp_output_keep_prob": 0.85,
        },
        "decoder": FakeDecoder,
        "decoder_params": {},
        "loss": BasicSequenceLoss,
        "loss_params": {},
        "data_layer": SyntheticLMDataLayer,
        "data_layer_params": {"vocab_size": 40, "bptt": 12,
                              "num_batches": 2},
    }
    model = LSTMLM(params=params, mode="train", mesh=mesh)
    batch = next(iter(model.get_data_layer().iterate_one_epoch()))
    state = model.init_state(batch)
    return model, state, shard_batch(batch, mesh)


def test_chained_steps_match_sequential(tiny_lm):
    model, state, batch = tiny_lm
    rng = jax.random.PRNGKey(7)

    step = jax.jit(model.train_step)
    k = 4
    seq_state = state
    for i in range(k):
        seq_state, _ = step(seq_state, batch,
                            jax.random.fold_in(rng, i))
    chained_state, _ = make_multi_step(model, k)(_copy(state), batch,
                                                 rng)
    for a, b in zip(jax.tree_util.tree_leaves(seq_state.params),
                    jax.tree_util.tree_leaves(chained_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert int(chained_state.step) == k


def test_time_chained_steps_counts(tiny_resnet):
    model, state, batch = tiny_resnet
    wall, n_steps, out_state = time_chained_steps(
        model, _copy(state), batch, jax.random.PRNGKey(0),
        chain=2, calls=2)
    assert n_steps == 4
    assert wall > 0.0
    # warmup call + 2 timed calls, 2 steps each
    assert int(out_state.step) == 6


def test_synthetic_lm_layer_contract():
    dl = SyntheticLMDataLayer(
        {"vocab_size": 50, "bptt": 8, "batch_size": 4, "num_batches": 2,
         "mode": "train", "shuffle": False}, model=None)
    batches = list(dl.iterate_one_epoch())
    assert len(batches) == 2
    x, xl = batches[0]["source_tensors"]
    y, _ = batches[0]["target_tensors"]
    assert x.shape == (4, 8) and y.shape == (4, 8)
    # next-token alignment: y[t] == x[t+1]
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
    assert xl.dtype == np.int32 and (xl == 8).all()


def test_synthetic_tts_layer_contract():
    dl = SyntheticTTSDataLayer(
        {"src_vocab_size": 30, "num_audio_features": 12,
         "text_length": 16, "spec_length": 24, "batch_size": 3,
         "num_batches": 1, "mode": "train", "shuffle": False},
        model=None)
    assert dl.params["num_output_features"] == 12
    (batch,) = list(dl.iterate_one_epoch())
    text, text_len = batch["source_tensors"]
    spec, stop, spec_len = batch["target_tensors"]
    assert text.shape == (3, 16) and spec.shape == (3, 24, 12)
    assert stop.shape == (3, 24)
    # stop target: 0 while generating, 1 at the end
    assert (stop[:, :-1] == 0).all() and (stop[:, -1] == 1).all()
    assert (spec_len == 24).all()
