from . import collapse, dedup, multimodal, sampling, similarity, text

__all__ = ["collapse", "dedup", "multimodal", "sampling", "similarity", "text"]
