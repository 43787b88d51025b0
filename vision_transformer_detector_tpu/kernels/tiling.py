"""Shared tile-size arithmetic for the Pallas kernels.

One definition instead of three private copies (flash_attention /
fused_ffn / quantization each carried an identical ``_round_up`` —
round-4 review finding): a tiling-policy tweak must land everywhere at
once.
"""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return (x + m - 1) // m * m
