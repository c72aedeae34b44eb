from texgs.config import Cfg, in_range


def test_missing_keys_are_falsy():
    cfg = Cfg({"a": {"b": 1}})
    assert cfg.a.b == 1
    assert not cfg.missing
    assert not cfg.a.missing.deeper
    # missing access does not insert
    assert "missing" not in cfg


def test_nested_wrapping_and_values():
    cfg = Cfg({"loss_cfg": {"lambda_dssim": 0.2, "norm_range": [2000, None]}})
    assert cfg.loss_cfg.lambda_dssim == 0.2
    assert cfg.loss_cfg.norm_range == [2000, None]
    assert not cfg.loss_cfg.lambda_depth  # absent -> falsy


def test_to_dict_roundtrip():
    d = {"x": {"y": [1, 2, {"z": 3}]}, "w": "s"}
    assert Cfg(d).to_dict() == d


def test_in_range_semantics():
    # (start, end], open Null bounds — parity with BaseModel.in_range
    assert not in_range(2000, [2000, None])
    assert in_range(2001, [2000, None])
    assert in_range(5, [None, 5])
    assert not in_range(6, [None, 5])
    assert in_range(123, None)
    assert in_range(123, [])


def test_falsy_zero_is_preserved():
    cfg = Cfg({"v": 0, "f": 0.0})
    assert cfg.v == 0 and "v" in cfg
    assert cfg.get_or("v", 7) == 0
    assert cfg.get_or("absent", 7) == 7
