"""probminhash_spark — a PySpark-native near-duplicate detection and
clustering engine re-expressing jean-pierreBoth/probminhash's sketch family
(ProbMinHash3/3a, SuperMinHash, SetSketch, OPH+densification) as Arrow-batched
DataFrame pipelines with LSH banding, exact verification, and
connected-components clustering.

Layout:
- kernels/    pure-numpy sketch algorithms (ports of src/*.rs, SURVEY.md §2.1)
- functions/  pandas UDFs + native Column helpers
- operators/  DataFrame-level dedup / similarity / text / clustering ops
- pipeline/   staged, checkpointed, resumable dedup pipeline
- streaming/  Structured Streaming incremental variants
"""

__version__ = "0.1.0"
