from . import sepaihrd

__all__ = ["sepaihrd"]
