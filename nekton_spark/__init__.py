"""nekton_spark — a PySpark-native analytics/stream engine.

Re-expresses the full operator surface of the reference stream
processor (YAML-configured input → processors → output pipelines)
on Spark DataFrames / Structured Streaming, and extends it with the
relational layer and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .spec import Spec, compile_spec, run_spec  # noqa: F401
