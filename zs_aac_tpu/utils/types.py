"""Type aliases and device helpers.

Capability parity with ``/root/reference/custom_types.py:1-44``: tensor
type aliases used across the reference's signatures, debugger detection,
and the device-picking helper (cuda-index clamp -> TPU/device-count clamp).
"""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple, Union

import jax
import numpy as np

__all__ = [
    "T", "TN", "ARRAY", "ARRAYS", "VS", "VN", "TS", "D",
    "is_debugging", "get_device",
]

T = jax.Array
TN = Optional[jax.Array]
ARRAY = np.ndarray
ARRAYS = Union[Tuple[ARRAY, ...], List[ARRAY]]
VS = Union[Tuple[jax.Array, ...], List[jax.Array]]
VN = Optional[jax.Array]
TS = Union[Tuple[jax.Array, ...], List[jax.Array]]
D = jax.Device


def is_debugging() -> bool:
    """True when running under a tracer/debugger (custom_types.py DEBUG)."""
    return sys.gettrace() is not None


def get_device(device_id: int = 0) -> jax.Device:
    """Device by index, clamped to the available count
    (custom_types.py get_device's cuda-index clamp)."""
    devices = jax.devices()
    return devices[min(max(device_id, 0), len(devices) - 1)]
