"""Shared test assertions (reference tests/utils.py:28-77 analog)."""

import pickle

import numpy as np

from smol_tpu.serial import dumps_obj, loads_obj


def assert_msonable(obj):
    """Object survives the JSON (MSON-style) round trip."""
    clone = loads_obj(dumps_obj(obj))
    assert type(clone) is type(obj)
    d1, d2 = obj.as_dict(), clone.as_dict()
    _assert_equal_dicts(d1, d2)
    return clone


def assert_pickles(obj):
    """Object survives a pickle round trip."""
    clone = pickle.loads(pickle.dumps(obj))
    assert type(clone) is type(obj)
    if hasattr(obj, "as_dict"):
        _assert_equal_dicts(obj.as_dict(), clone.as_dict())
    return clone


def _assert_equal_dicts(d1, d2, path=""):
    assert set(d1.keys()) == set(d2.keys()), (path, d1.keys(), d2.keys())
    for k in d1:
        v1, v2 = d1[k], d2[k]
        where = f"{path}.{k}"
        if isinstance(v1, dict):
            _assert_equal_dicts(v1, v2, where)
        elif isinstance(v1, (list, tuple, np.ndarray)):
            a1, a2 = np.asarray(v1, dtype=object), np.asarray(v2, dtype=object)
            assert a1.shape == a2.shape, where
            if a1.size and isinstance(a1.flat[0], dict):
                for e1, e2 in zip(a1.flat, a2.flat):
                    _assert_equal_dicts(e1, e2, where)
            else:
                assert str(a1.tolist()) == str(a2.tolist()), where
        else:
            assert str(v1) == str(v2), (where, v1, v2)
