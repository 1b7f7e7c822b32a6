from . import dedup, multimodal, queries, relational, similarity, textstats

__all__ = ["dedup", "multimodal", "queries", "relational", "similarity", "textstats"]
