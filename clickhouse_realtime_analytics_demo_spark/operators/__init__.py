"""Large-scale training-data pipeline operators (beyond-reference).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen); Pandas UDFs appear only where array math
genuinely benefits from vectorization.
"""
