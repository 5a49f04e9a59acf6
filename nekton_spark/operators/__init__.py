from . import llm, messages, process, relational, text, timeseries  # noqa: F401  (register type tags)
from .messages import MESSAGE_SCHEMA, collect_batches, from_column, messages_df, renumber  # noqa: F401
