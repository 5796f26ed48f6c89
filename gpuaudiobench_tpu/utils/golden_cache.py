"""Disk cache for expensive CPU goldens (the full NumPy FDTD simulation
takes minutes; it is deterministic in its parameters, so cache it).

Cache lives in <repo>/.golden_cache (gitignored). Keys hash the
parameter dict plus a version tag; bump the tag when reference
semantics change.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Dict

import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".golden_cache",
)


def cached_golden(
    name: str, params: Dict, compute: Callable[[], np.ndarray], version: int = 1
) -> np.ndarray:
    key = json.dumps({"name": name, "v": version, **params}, sort_keys=True)
    digest = hashlib.sha256(key.encode()).hexdigest()[:24]
    path = os.path.join(_CACHE_DIR, f"{name}_{digest}.npy")
    if os.path.exists(path):
        try:
            return np.load(path)
        except Exception:  # noqa: BLE001 - corrupt cache entry
            pass
    value = compute()
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp.npy"
        with open(tmp, "wb") as f:
            np.save(f, value)
        os.replace(tmp, path)
    except OSError:
        pass
    return value
