"""Input pipeline: native prefetching token loader."""

from .loader import TokenLoader

__all__ = ["TokenLoader"]
