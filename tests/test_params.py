import pytest

from openseq2seq_tpu.utils.params import (check_params, flatten_dict,
                                          nest_dict, nested_update)


def test_required_missing():
    with pytest.raises(ValueError, match="required"):
        check_params({}, {"a": int}, {})


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="Unknown config parameter"):
        check_params({"a": 1, "zzz": 2}, {"a": int}, {})


def test_type_and_options():
    check_params({"a": 1, "b": "x"}, {"a": int}, {"b": ["x", "y"]})
    with pytest.raises(ValueError):
        check_params({"a": "not-int"}, {"a": int}, {})
    with pytest.raises(ValueError):
        check_params({"b": "z"}, {}, {"b": ["x", "y"]})


def test_bool_not_int():
    with pytest.raises(ValueError):
        check_params({"a": True}, {"a": int}, {})


def test_int_ok_for_float():
    check_params({"a": 3}, {"a": float}, {})


def test_none_spec_accepts_anything():
    check_params({"a": object()}, {"a": None}, {})


def test_flatten_nest_roundtrip():
    d = {"a": {"b": 1, "c": {"d": 2.5}}, "e": "x"}
    flat = flatten_dict(d)
    assert flat == {"a/b": 1, "a/c/d": 2.5, "e": "x"}
    assert nest_dict(flat) == d


def test_nested_update():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    nested_update(base, {"a": {"c": 20}, "e": 5})
    assert base == {"a": {"b": 1, "c": 20}, "d": 3, "e": 5}


def test_setup_compile_cache(tmp_path):
    """`compile_cache_dir` flips JAX's persistent compilation cache on
    (startup-latency lever documented in docs/internals.md); absent key
    is a no-op returning None."""
    import os

    import jax
    import jax.numpy as jnp

    from openseq2seq_tpu.utils.config import setup_compile_cache

    assert setup_compile_cache({}) is None

    cache_dir = str(tmp_path / "xla_cache")
    applied = setup_compile_cache({"compile_cache_dir": cache_dir})
    try:
        assert applied == cache_dir
        assert jax.config.jax_compilation_cache_dir == cache_dir
        # drop the min-compile-time gate so even a toy CPU jit is cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.jit(lambda x: x * 2.0 + 1.0)(jnp.arange(8.0))
        assert os.path.isdir(cache_dir) and os.listdir(cache_dir), \
            "persistent cache produced no entries"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
