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
