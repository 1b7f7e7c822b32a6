from . import dedup, queries, relational, similarity, textstats

__all__ = ["dedup", "queries", "relational", "similarity", "textstats"]
