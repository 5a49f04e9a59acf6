from . import dedup, multimodal, similarity, text_analysis  # noqa: F401
