"""Shared fixtures: a local SparkSession and an in-process import of the
reference's pure functions (the parity oracle, SURVEY §5.1).

The reference depends on loguru (absent here) only for logging; a no-op stub
makes its pure modules importable. Network-touching functions are never
called.
"""

from __future__ import annotations

import sys
import types

import pytest

REFERENCE_PATH = "/root/reference"


def _install_loguru_stub() -> None:
    if "loguru" in sys.modules:
        return
    stub = types.ModuleType("loguru")

    class _Noop:
        def __getattr__(self, name):
            return lambda *a, **k: None

    stub.logger = _Noop()
    sys.modules["loguru"] = stub


@pytest.fixture(scope="session")
def ref():
    """Namespace with the reference's pure modules (oracle)."""
    _install_loguru_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import app.hash_detector as hash_detector
    import app.models as models

    ns = types.SimpleNamespace(
        hash_detector=hash_detector,
        models=models,
        MinHashDetector=hash_detector.MinHashDetector,
    )
    return ns


@pytest.fixture(scope="session")
def detector(ref):
    """Reference MinHashDetector at parity config (k=100, seed 42)."""
    return ref.MinHashDetector(num_hashes=100, seed=42)


@pytest.fixture(scope="session")
def spark():
    from dedup.session import build_session

    s = build_session(app_name="dedup-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
