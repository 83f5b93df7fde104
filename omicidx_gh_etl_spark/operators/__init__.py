from . import ann_index, dedup, multimodal, sequences, sketch, similarity, text

__all__ = [
    "ann_index",
    "dedup",
    "sequences",
    "similarity",
    "sketch",
    "text",
    "multimodal",
]
