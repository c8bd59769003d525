from .scalars import davg, dsum, r4, r6

__all__ = ["davg", "dsum", "r4", "r6"]
