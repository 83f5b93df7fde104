from . import dedup, multimodal, sketch, similarity, text

__all__ = ["dedup", "similarity", "sketch", "text", "multimodal"]
