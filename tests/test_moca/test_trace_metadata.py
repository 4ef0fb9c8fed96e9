"""Dedicated coverage for Metadata and Trace/StepTrace containers."""

import numpy as np

from smol_tpu.moca.metadata import Metadata
from smol_tpu.moca.trace import StepTrace, Trace
from smol_tpu.serial import dumps_obj, loads_obj


def test_metadata_roundtrip_and_nesting():
    inner = Metadata("Flip", sublattices=[0, 1])
    spec = Metadata(
        "Metropolis", seed=123, temperature=300.0, usher=inner.as_dict()
    )
    assert spec.cls_name == "Metropolis"
    assert spec.seed == 123
    d = spec.as_dict()
    assert d["@class"] == "Metadata"
    assert d["usher"]["cls_name"] == "Flip"
    restored = Metadata.from_dict(d)
    assert restored.cls_name == "Metropolis"
    assert restored.temperature == 300.0
    # through the full MSON machinery too
    json_restored = loads_obj(dumps_obj(spec))
    assert json_restored.seed == 123


def test_trace_coerces_to_ndarray():
    tr = Trace(occupancy=[1, 0, 1], enthalpy=2.5)
    assert isinstance(tr.occupancy, np.ndarray)
    assert isinstance(tr.enthalpy, np.ndarray)
    assert set(tr.names) == {"occupancy", "enthalpy"}
    d = tr.as_dict()
    assert d["occupancy"] == [1, 0, 1]


def test_step_trace_nested_delta():
    st = StepTrace(accepted=np.array([True]))
    st.delta_trace.enthalpy = -0.25
    # delta values are ndarray-coerced like the parent
    assert isinstance(st.delta_trace.enthalpy, np.ndarray)
    # delta_trace is carried but not listed among the value names
    assert "delta_trace" not in st.names
    assert "accepted" in st.names
    assert st.delta_trace.names == ["enthalpy"]
