"""Data-pipeline function library: text analysis, dedup, similarity,
multimodal, curation (sampling/quotas/decontamination), shard packing,
information retrieval (TF-IDF / collocations / inverted index), and
blocked entity resolution.

These extend the reference's surface (which has no scalar functions —
SURVEY §2.5) with the operations a large-scale training-data pipeline needs.
Everything is built from `pyspark.sql.functions` Column expressions (JVM-side,
whole-stage codegen) except where Python is genuinely required, in which case
Arrow-batched Pandas UDFs are used.
"""
