"""Semver packing tests (reference src/semver.c semantics)."""

import pytest

from minnow_c_tpu import semver


def test_pack_unpack():
    v = semver.pack(1, 2, 3, semver.BETA)
    assert semver.major(v) == 1
    assert semver.minor(v) == 2
    assert semver.patch(v) == 3
    assert semver.stage(v) == semver.BETA


def test_string_roundtrip():
    for s in ("0.9.0-dev", "1.0.0", "2.10.3-rc", "0.0.1-alpha",
              "255.255.255"):
        assert semver.to_string(semver.from_string(s)) == s


def test_compare_ignores_stage():
    # semver.c:9-15: comparisons mask the stage byte.
    a = semver.from_string("1.2.3-dev")
    b = semver.from_string("1.2.3")
    assert semver.equals(a, b)
    assert not semver.greater(a, b)
    c = semver.from_string("1.2.4-dev")
    assert semver.greater(c, b)


def test_ordering():
    assert semver.greater(semver.from_string("2.0.0"),
                          semver.from_string("1.255.255"))
    assert semver.greater(semver.from_string("0.10.0"),
                          semver.from_string("0.9.9"))


def test_bad_strings():
    for s in ("1.2", "a.b.c", "1.2.3-gamma", "300.0.0"):
        with pytest.raises(ValueError):
            semver.from_string(s)


def test_byte_layout():
    # Spec: patch in the low byte, then minor, then major
    # (header_format.tex:289-297).
    v = semver.pack(0x12, 0x34, 0x56, semver.RELEASE)
    assert v == (4 << 24) | (0x12 << 16) | (0x34 << 8) | 0x56
