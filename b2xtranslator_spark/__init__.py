"""b2xtranslator_spark: PySpark-native binary-document text extraction.

A from-scratch rebuild of GustavoHennig/b2xtranslator's extraction
capabilities (CFB/OLE2 containers, Word piece table + character runs, XLS
BIFF + SST, PPT record atoms) as an Arrow-batched Spark pipeline over
conversation-transcript tables, plus the training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
corpus pipeline needs. See SURVEY.md for the blueprint and README.md for
the implementation map.
"""

__version__ = "0.1.0"

from .extractors import ExtractResult, extract_payload_text  # noqa: F401
