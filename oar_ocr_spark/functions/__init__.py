"""Large-scale training-data pipeline operations.

First-class components beyond the reference's own operators: exact and
near deduplication, similarity search over embeddings, text analysis,
and multimodal column plumbing. All hot paths are JVM-side
pyspark.sql.functions (codegen'd); Python appears only in vectorized
pandas UDFs (simhash bit-packing, LSH hyperplane projection).
"""
