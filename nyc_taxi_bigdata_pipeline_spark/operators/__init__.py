from . import asof, dedup, maintenance, multimodal, similarity, skew, text, topk, upsert

__all__ = ["asof", "dedup", "maintenance", "multimodal", "similarity", "skew", "text", "topk", "upsert"]
