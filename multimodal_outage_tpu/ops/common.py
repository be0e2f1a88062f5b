"""Shared TPU kernel constants and tiling helpers.

One definition for the lane width and rounding used by every Pallas
kernel in this package (gwnet_pallas, gwnet_stack_pallas,
dcrnn_stack_pallas) — a chip-generation change lands in one place.
"""

LANES = 128  # TPU vector-register lane width: the minor-dim tile


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x."""
    return (x + m - 1) // m * m
