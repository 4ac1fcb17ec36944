"""dygiepp_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of DyGIE++
(dwadden/dygiepp): span-based joint information extraction (NER, relations,
events, within-document coreference) re-expressed as idiomatic Spark over
tables of multi-turn conversation/agent transcripts.

Architecture (Spark-first, NOT a port — see SURVEY.md):
  - input: turns table (conv_id, turn_idx, role, text, tool, ts)
  - document assembly via windows over stable turn ordering (reference:
    dygie/data/dataset_readers/document.py:114-118)
  - span enumeration / label alignment / pruning / pair scoring as
    DataFrame ops (joins + window functions), never per-row Python
  - model inference as batched Arrow ``mapInPandas`` UDFs
  - coreference clustering via distributed connected components
  - entity linking via broadcast alias dictionaries, canonical triple
    materialization with explicit partitioning/salting for skew
"""

from dygiepp_spark.session import get_spark
from dygiepp_spark.config import PipelineConfig

__version__ = "0.1.0"

__all__ = ["get_spark", "PipelineConfig", "__version__"]
