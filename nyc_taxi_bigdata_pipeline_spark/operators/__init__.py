from . import dedup, multimodal, similarity, skew, text, topk, upsert

__all__ = ["dedup", "multimodal", "similarity", "skew", "text", "topk", "upsert"]
