"""Env-var flag parsing (cellulus_tpu/utils/env.py).

Every boolean perf knob resolves through one helper so that ``NAME=0``
disables exactly like ``NAME=1`` enables — a bare truthy-string check
would read ``NAME=0`` as *on*, which bit the round-3 knob surface.
"""

import pytest

from cellulus_tpu.utils.env import env_flag, resolve_flag

VAR = "CELLULUS_TPU_TEST_FLAG"


@pytest.mark.parametrize(
    "value,expected",
    [
        ("1", True),
        ("true", True),
        ("TRUE", True),
        ("yes", True),
        ("on", True),
        ("anything-else", True),
        ("0", False),
        ("false", False),
        ("False", False),
        ("no", False),
        ("off", False),
        ("", False),
        ("  0  ", False),  # whitespace-tolerant
    ],
)
def test_env_flag_values(monkeypatch, value, expected):
    monkeypatch.setenv(VAR, value)
    assert env_flag(VAR) is expected


def test_env_flag_unset(monkeypatch):
    monkeypatch.delenv(VAR, raising=False)
    assert env_flag(VAR) is False


def test_resolve_flag_config_wins(monkeypatch):
    # config field set -> env var ignored entirely
    monkeypatch.setenv(VAR, "1")
    assert resolve_flag(False, VAR) is False
    monkeypatch.setenv(VAR, "0")
    assert resolve_flag(True, VAR) is True


def test_resolve_flag_env_fallback(monkeypatch):
    monkeypatch.setenv(VAR, "1")
    assert resolve_flag(None, VAR) is True
    monkeypatch.setenv(VAR, "0")
    assert resolve_flag(None, VAR) is False
    monkeypatch.delenv(VAR)
    assert resolve_flag(None, VAR) is False
