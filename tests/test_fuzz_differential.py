"""Seeded slice of the differential fuzzer (scripts/fuzz_differential.py):
random shapes/axes/dtypes/bins/weights/density configs, every method vs the
numpy oracle. The standalone script runs arbitrarily long hunts; this keeps
a fixed-seed regression slice in CI.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

_SCRIPT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "scripts"
    / "fuzz_differential.py"
)
spec = importlib.util.spec_from_file_location("fuzz_differential", _SCRIPT)
fuzz = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fuzz)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_slice(seed):
    rng = np.random.RandomState(seed)
    methods = ["auto", "scatter", "onehot", "sort", "pallas"]
    for i in range(20):
        assert fuzz.one_case(rng, i, methods), f"seed={seed} case={i}"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [2, 3])
def test_fuzz_slice_forced_xla_digitize(seed, monkeypatch):
    """Same differential fuzz with the TPU XLA digitize routes forced on
    (compare-sum + jnp uniform-certificate digitize) — CPU-backend parity
    for the code paths the auto rule only enables on TPU."""
    from xhistogram_tpu.ops import digitize as dg

    monkeypatch.setattr(dg, "_CMP_MODE", "1")
    monkeypatch.setattr(dg, "_XLA_UNI_MODE", "1")
    rng = np.random.RandomState(seed)
    methods = ["auto", "scatter", "sort"]
    for i in range(15):
        assert fuzz.one_case(rng, i, methods), f"seed={seed} case={i}"
