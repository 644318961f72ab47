from ethzasl_brisk_tpu.ba.se3 import (
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)
from ethzasl_brisk_tpu.ba.window import BaProblem, solve_window_ba

__all__ = [
    "BaProblem",
    "se3_exp",
    "se3_log",
    "so3_exp",
    "so3_log",
    "solve_window_ba",
]
