"""Auxiliary subsystems: profiling, seeding (SURVEY.md §5)."""

from .profiling import StepTimer, profile_trace
from .seeding import seed_everything

__all__ = ["profile_trace", "StepTimer", "seed_everything"]
