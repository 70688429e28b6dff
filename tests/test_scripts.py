"""Unit coverage for the offline analysis scripts (ADVICE round-4 items)."""
import importlib
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


@pytest.fixture(autouse=True)
def _scripts_on_path():
    sys.path.insert(0, SCRIPTS)
    yield
    sys.path.remove(SCRIPTS)


@pytest.mark.parametrize(
    "name,expected",
    [
        ("%dot.5 = bf16[8,128]{1,0:T(8,128)(2,1)} dot(%a, %b)", "dot"),
        # tuple-typed results (multi-output fusions, Pallas custom-calls):
        # the opcode is the first token after the stripped tuple type
        ("%t.5 = (bf16[8]{0}, f32[4,4]{1,0:T(8,128)}) tuple(%x, %y)", "tuple"),
        (
            "%fusion.3 = (f32[2,8]{1,0}, f32[2,8]{1,0}) fusion(%p0), kind=kLoop",
            "fusion",
        ),
        (
            "%custom-call.7 = (bf16[192,4096,128]{2,1,0}) custom-call(%q, %k, %v)",
            "custom-call",
        ),
        ("%param.1, f32[4]{0} parameter(1)", "parameter"),
        ("copy.8", "copy"),
    ],
)
def test_opcode_of(name, expected):
    from parse_profile import opcode_of

    assert opcode_of(name) == expected


def test_bench_ln_variants_imports():
    # the committed script must at least import (ADVICE: it referenced a
    # probe implementation that was never shipped)
    mod = importlib.import_module("bench_ln_variants")
    assert hasattr(mod, "main")
