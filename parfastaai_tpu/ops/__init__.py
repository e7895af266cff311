from .intersect import intersection_counts, pair_counts

__all__ = ["intersection_counts", "pair_counts"]
