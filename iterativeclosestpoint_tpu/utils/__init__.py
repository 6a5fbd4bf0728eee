"""Config, synthetic fixtures, and the NumPy oracle of the reference."""

from iterativeclosestpoint_tpu.utils.config import AppSettings, ICPConfig

__all__ = ["AppSettings", "ICPConfig"]
