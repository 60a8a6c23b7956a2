"""Property tests (hypothesis) for the pure-Python math the generator's
uniqueness guarantees rest on — no SparkSession needed, so these run in
milliseconds and explore far more cases than the fixture tests."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from synthetic_data_transfer_to_relational_database_spark.plans.executor import (
    _coprime_step,
    _stable_hash,
)


@given(n=st.integers(min_value=1, max_value=5000), seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=200)
def test_coprime_step_is_coprime(n, seed):
    a = _coprime_step(n, seed)
    assert 1 <= a
    assert math.gcd(a, n) == 1


@given(n=st.integers(min_value=1, max_value=2000), seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100)
def test_affine_permutation_is_bijective(n, seed):
    """The without-replacement FK sampler maps i -> (a*i + b) mod n; with
    gcd(a, n) = 1 this must be a bijection on [0, n) — the property the
    unique-index guarantee rests on."""
    a = _coprime_step(n, seed)
    b = seed % n
    image = {(a * i + b) % n for i in range(n)}
    assert len(image) == n


@given(s=st.text(min_size=0, max_size=50))
@settings(max_examples=200)
def test_stable_hash_deterministic_and_bounded(s):
    h = _stable_hash(s)
    assert 0 <= h < 1_000_003
    assert h == _stable_hash(s)


@given(
    idx=st.lists(st.integers(min_value=0, max_value=36**6 - 1), min_size=2, max_size=50, unique=True)
)
@settings(max_examples=100)
def test_seq_code_base36_injective(idx):
    """seq_code emits lpad(base36(i), n): distinct indices below 36^n must
    yield distinct codes (mirrors the Spark expression in compiler.py)."""

    def base36(i: int) -> str:
        if i == 0:
            return "0"
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
        out = ""
        while i:
            out = digits[i % 36] + out
            i //= 36
        return out

    codes = {base36(i).rjust(6, "0") for i in idx}
    assert len(codes) == len(idx)
