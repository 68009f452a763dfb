"""Large-scale training-data-pipeline operators (the north-star extensions
beyond the reference's own surface — BASELINE.json):

- ``dedup``      — exact (fingerprint groupBy), MinHash-LSH, SimHash
- ``similarity`` — brute-force cosine top-k + LSH-bucketed ANN
- ``text``       — language ID, quality scoring, token counting, rolling
                   document fingerprints
- ``multimodal`` — opaque binary payload columns with typed metadata and
                   Arrow-batched decode plumbing (real header decode;
                   pixel/audio kernels stubbed: the libs are not in this
                   container)
- ``sampling``   — deterministic stratified sampling + exact-quota
                   dataset-mixture manifests
- ``contamination`` — benchmark decontamination via exact n-gram
                   span overlap against a broadcast evaluation set
- PII scrubbing — RE2-safe detector/redactor columns (``text.py``)

``CurationPipeline`` below bundles the curation surface over a document
corpus the way ``api.RegistryAnalytics`` bundles the registry surface.

Every operator is designed shuffle-first for 100 TB: candidate generation
is always a bucketed equi-join (LSH bands, SimHash chunks, ANN buckets),
never an n² cross product; exact verification runs only on candidates.
"""


class CurationPipeline:
    """User-facing facade over a documents corpus: the operations a
    training-data pipeline chains, each backed by the driver-verified
    operator underneath."""

    def __init__(self, docs, id_col: str = "doc_id",
                 text_col: str = "text",
                 source_col: str = "source") -> None:
        self.docs = docs
        self.id_col, self.text_col = id_col, text_col
        self.source_col = source_col

    @classmethod
    def from_sf_dir(cls, spark, sf_dir: str) -> "CurationPipeline":
        from axonops_schema_registry_spark.catalog import load_table

        return cls(load_table(spark, sf_dir, "documents"))

    def near_dup_pairs(self, threshold: float = 0.8, ngram: int = 3):
        from axonops_schema_registry_spark.llm.dedup import (
            minhash_lsh_pairs,
        )

        return minhash_lsh_pairs(self.docs, self.id_col, self.text_col,
                                 threshold, ngram)

    def dedup_flags(self, threshold: float = 0.8, ngram: int = 3):
        """First-wins ingestion flags (dd7)."""
        from axonops_schema_registry_spark.llm.dedup import (
            incremental_dedup_flags,
        )

        return incremental_dedup_flags(self.docs, self.id_col,
                                       self.text_col, threshold, ngram)

    def deduplicated(self, threshold: float = 0.8, ngram: int = 3):
        """The cleaned corpus: originals only."""
        from pyspark.sql import functions as F

        flags = self.dedup_flags(threshold, ngram)
        return (self.docs.join(
            flags.filter(~F.col("is_dup")).select(self.id_col),
            self.id_col))

    def sample(self, rates):
        """Deterministic per-source sampling (smp1); ``rates`` is a
        (source, rate) DataFrame."""
        from axonops_schema_registry_spark.llm.sampling import (
            stratified_sample,
        )

        return stratified_sample(self.docs, rates, self.id_col,
                                 self.source_col)

    def mixture(self, quotas):
        """Exact-quota mixture manifest (mix1); ``quotas`` is a
        (source, quota) DataFrame with integer quotas."""
        from axonops_schema_registry_spark.llm.sampling import (
            dataset_mixture,
        )

        return dataset_mixture(self.docs, quotas, self.id_col,
                               self.source_col)

    def language_id(self):
        from axonops_schema_registry_spark.llm.text import predict_lang

        return self.docs.select(
            self.id_col, predict_lang(self.text_col).alias("lang"))

    def pii_scan(self):
        """Per-document PII match counts (tx7's audit path)."""
        from axonops_schema_registry_spark.llm.text import pii_counts

        return self.docs.select(self.id_col, *pii_counts(self.text_col))

    def redacted(self):
        """The corpus with every PII match replaced by a typed tag."""
        from axonops_schema_registry_spark.llm.text import pii_redact

        return self.docs.withColumn(self.text_col,
                                    pii_redact(self.text_col))

    def contamination(self, test_docs, n: int = 5):
        """Flag training documents carrying exact n-gram spans from a
        held-out evaluation set (ctm1)."""
        from axonops_schema_registry_spark.llm.contamination import (
            contamination_flags,
        )

        return contamination_flags(self.docs, test_docs, self.id_col,
                                   self.text_col, n)

    def dataset_card(self, spark, sf_dir: str):
        """Per-source curation rollup (tx5)."""
        from axonops_schema_registry_spark.queries.llm_queries import (
            tx5_dataset_card,
        )

        return tx5_dataset_card(spark, sf_dir)
