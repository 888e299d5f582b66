"""Reference-name alias: `from torchmd_tpu.mycalc import MyCalc`
(mirrors torchmd/mycalc.py)."""

from .calculators.ase_calc import MyCalc

__all__ = ["MyCalc"]
