"""pennsieve_streaming_spark — a PySpark-native time-series analytics engine.

A from-scratch Spark rebuild of the query semantics of
Pennsieve/pennsieve-streaming (a Scala/Akka neurophysiology time-series
streaming service), re-expressed as DataFrame/SQL operators plus
Structured Streaming ingest, and extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Layout:
  session     — tuned SparkSession builder
  datamodel   — schemas + engine constants
  tables      — test-table loaders + derived canonical views
  operators/  — time-series query operators (window, downsample, gaps,
                montage, events, spikes, realtime, filtering)
  dsp/        — pure-numpy Butterworth design + stateful IIR filtering
  llm/        — dedup, similarity search, text analysis, multimodal
  streaming/  — Structured Streaming ingest + realtime resample
  serving/    — session state (filters/montage/epoch) for a WS layer
"""

__version__ = "0.1.0"
