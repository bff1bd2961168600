from . import dedup, multimodal, similarity, text, topk, upsert

__all__ = ["dedup", "multimodal", "similarity", "text", "topk", "upsert"]
