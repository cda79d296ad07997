"""Vectorized constraint plans: Draft-4 keywords as pyarrow.compute kernels."""

from .plan import UnsupportedPlanError, VectorPlan, compile_plan

__all__ = ["UnsupportedPlanError", "VectorPlan", "compile_plan"]
