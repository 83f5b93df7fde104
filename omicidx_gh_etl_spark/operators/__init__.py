from . import ann_index, dedup, multimodal, sketch, similarity, text

__all__ = ["ann_index", "dedup", "similarity", "sketch", "text", "multimodal"]
