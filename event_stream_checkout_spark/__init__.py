"""event_stream_checkout_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing semantics of the reference system
``Ravindra-Reddy27/Event-Stream-Checkout`` (an AWS serverless
event-driven checkout pipeline), extended with the relational /
streaming / LLM-data-pipeline operator surface described in SURVEY.md.

Design stance (SURVEY.md §7):
- Everything is DataFrame algebra; Catalyst does the optimizing.
- Exactly two custom stateful components (settlement fold, dedup state).
- Zero row-at-a-time Python UDFs on the hot path; Pandas/Arrow UDFs
  only where built-in expressions genuinely cannot express semantics.
- Structured Streaming is a thin shell over batch-tested logic.
"""

__version__ = "0.1.0"
