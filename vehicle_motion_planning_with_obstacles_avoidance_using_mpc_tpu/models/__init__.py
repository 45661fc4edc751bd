"""OBCA optimal-control problem builders (layers L1 of SURVEY.md)."""

from .obca import (
    OBCASpec,
    OBCAData,
    init_vars,
    objective,
    eq_constraints,
    ineq_constraints,
    signed_clearance,
)
from .builder import build_obca_data

__all__ = [
    "OBCASpec",
    "OBCAData",
    "init_vars",
    "objective",
    "eq_constraints",
    "ineq_constraints",
    "signed_clearance",
    "build_obca_data",
]
