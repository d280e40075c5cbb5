"""MinHash permutation coefficients — frozen fixture.

The single most parity-critical fixture in the engine. The reference draws
two lists of k unique random ints in [0, 2^32-1] from a seeded CPython
``random`` stream, accumulated in a ``set`` and returned as ``list(set)``
(reference: app/hash_detector.py:28-40). The resulting *order* is the set's
iteration order, which depends on CPython's small-int hashing — stable for a
given interpreter but not something to re-derive on executors.

We therefore run the same public algorithm ONCE on the driver, freeze the
arrays into a committed JSON fixture, validate the fixture against a live
import of the reference in tests, and broadcast the arrays to executors.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(__file__).parent / "fixtures"


def _unique_random_coeffs(k: int) -> list[int]:
    """k unique ints in [0, 2^32-1], set-accumulated from the current
    ``random`` stream — identical semantics to the reference's
    ``_pick_random_coeffs`` (app/hash_detector.py:34-40), including the
    ``list(set)`` ordering."""
    max_val = 2**32 - 1
    coeffs: set[int] = set()
    while len(coeffs) < k:
        coeffs.add(random.randint(0, max_val))
    return list(coeffs)


def generate_coeffs(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    """Draw (coeff_a, coeff_b) exactly as the reference constructor does:
    one ``random.seed(seed)`` then two successive draws from the same stream
    (app/hash_detector.py:28-30)."""
    random.seed(seed)
    a = _unique_random_coeffs(num_hashes)
    b = _unique_random_coeffs(num_hashes)
    return a, b


def _fixture_path(num_hashes: int, seed: int) -> Path:
    return FIXTURE_DIR / f"minhash_coeffs_seed{seed}_k{num_hashes}.json"


def freeze_coeffs(num_hashes: int, seed: int) -> Path:
    """Generate and commit the fixture file (idempotent)."""
    a, b = generate_coeffs(num_hashes, seed)
    path = _fixture_path(num_hashes, seed)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(
        {"seed": seed, "num_hashes": num_hashes, "coeff_a": a, "coeff_b": b},
        indent=0,
    ))
    return path


def load_coeffs(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Load (A, B) as uint64 arrays from the frozen fixture, generating it
    on first use for non-default configs."""
    path = _fixture_path(num_hashes, seed)
    if not path.exists():
        freeze_coeffs(num_hashes, seed)
    data = json.loads(path.read_text())
    a = np.asarray(data["coeff_a"], dtype=np.uint64)
    b = np.asarray(data["coeff_b"], dtype=np.uint64)
    if len(a) != num_hashes or len(b) != num_hashes:
        raise ValueError(f"fixture {path} has wrong length")
    return a, b


if __name__ == "__main__":
    for k in (100, 128):
        p = freeze_coeffs(k, 42)
        print(f"froze {p}")
