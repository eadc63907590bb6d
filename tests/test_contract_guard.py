"""The contract checker's dtype-representation guard (round-3 VERDICT
item 9, extended per round-4 item 8 to decimal-scale drift): the driver's
value-hash is representation-sensitive, so value-equal frames can still
hash-mismatch. These pin which disagreements the guard flags as clashes,
which it only warns on, and which it accepts."""

import decimal
import importlib.util
import pathlib

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "check_contract",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "check_contract.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
dtype_repr_findings = _mod.dtype_repr_findings


def D(s):
    return decimal.Decimal(s)


def test_identical_dtypes_clean():
    a = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    clashes, warns = dtype_repr_findings(a, a.copy())
    assert clashes == [] and warns == []


def test_int_vs_float_is_clash():
    a = pd.DataFrame({"n": pd.array([4, 5], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([4.0, 5.0], dtype="float64")})
    clashes, _ = dtype_repr_findings(a, b)
    assert len(clashes) == 1 and "int-vs-float" in clashes[0][1]


def test_decimal_vs_float_is_clash():
    a = pd.DataFrame({"s": [D("4"), D("5")]})
    b = pd.DataFrame({"s": [4.0, 5.0]})
    clashes, _ = dtype_repr_findings(a, b)
    assert len(clashes) == 1 and "decimal-vs-float" in clashes[0][1]


def test_decimal_scale_drift_is_clash():
    # decimal(38,0) `4` vs decimal(18,2) `4.00`: equal values, different
    # exponents -> different canonical strings -> driver hash drift. The
    # class appears now that exact-decimal sums (k-means trainer) are in
    # oracles (round-4 VERDICT item 8).
    a = pd.DataFrame({"s": [D("4"), D("5")]})
    b = pd.DataFrame({"s": [D("4.00"), D("5.00")]})
    clashes, _ = dtype_repr_findings(a, b)
    assert len(clashes) == 1 and "decimal-scale" in clashes[0][1]
    assert "-2" in clashes[0][1]  # names the disagreeing exponent


def test_same_scale_decimals_clean():
    a = pd.DataFrame({"s": [D("4.00"), None]})
    b = pd.DataFrame({"s": [None, D("5.00")]})
    clashes, warns = dtype_repr_findings(a, b)
    assert clashes == [] and warns == []


def test_decimal_vs_int_is_clash():
    a = pd.DataFrame({"s": [D("4"), D("5")]})
    b = pd.DataFrame({"s": pd.array([4, 5], dtype="int64")})
    clashes, _ = dtype_repr_findings(a, b)
    assert len(clashes) == 1 and "decimal-vs-int" in clashes[0][1]


def test_int_width_is_warning_only():
    # CORRECTNESS_r03: rank int32-vs-int64 was hash-green — warn, don't fail
    a = pd.DataFrame({"rank": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"rank": pd.array([1, 2], dtype="int64")})
    clashes, warns = dtype_repr_findings(a, b)
    assert clashes == []
    assert len(warns) == 1 and "int-width" in warns[0][1]
