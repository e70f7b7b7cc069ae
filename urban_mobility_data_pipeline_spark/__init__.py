"""urban_mobility_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark rebuild of the query & data-processing
capabilities of the reference lakehouse pipeline
(Hernanstupniki/Urban-Mobility-Data-Pipeline): medallion Bronze→Silver→Gold
batch pipeline with incremental watermarks, window dedup, rule-based
cleaning, SCD1/SCD2/SCD3 historization, star-schema conformance,
recompute-affected aggregates, GDPR erasure propagation, and retention —
plus LLM-scale data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis).

Everything is expressed with the stock DataFrame API so Catalyst/AQE pick
the physical plan; the only custom machinery is driver-side orchestration
(watermark control tables, SCD engines, GDPR propagation) exactly as the
reference does — see SURVEY.md §4.
"""

__version__ = "0.1.0"
