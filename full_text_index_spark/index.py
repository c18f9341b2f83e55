"""Index handle — open a built index and expose its tables.

The counterpart of the reference's ``load_index`` (reference:
utils/interface.h:44; ssa/SSA.cpp:506-531): persistence is native parquet,
so "loading" is lazy DataFrame definition plus one small JSON of global
stats (n_docs, avgdl — the analog of the C array / global counts the
reference serializes first, ssa/SSA.cpp:487-489).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_text_index_spark.build import IndexPaths


class InvertedIndex:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.paths = IndexPaths(root)
        with open(self.paths.meta) as fh:
            self.meta = json.load(fh)
        self.n_docs: int = self.meta["n_docs"]
        self.avgdl: float = self.meta["avgdl"]
        self.k1: float = self.meta["k1"]
        self.b: float = self.meta["b"]
        self.n_segments: int = self.meta["n_segments"]

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "InvertedIndex":
        return cls(spark, root)

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.postings)

    def term_stats(self) -> DataFrame:
        """(term, df, cf, max_tf, min_dl) + derived idf and an admissible
        max_impact bound under the CURRENT avgdl — vocab-sized."""
        ts = self.spark.read.parquet(self.paths.term_stats)
        n = float(self.n_docs)
        return ts.withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        ).withColumn("max_impact", self.impact_bound(F.col("max_tf"), F.col("min_dl")))

    def impact_bound(self, tf_col, dl_col):
        """Admissible upper bound of tf/(tf+norm(dl)) given current avgdl
        (impact is monotone increasing in tf, decreasing in dl)."""
        t = tf_col.cast("double")
        return t / (
            t
            + self.k1 * (1.0 - self.b + self.b * dl_col.cast("double") / self.avgdl)
        )

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.doc_stats)

    def index_size_bytes(self) -> int:
        """`index_size` analog (reference: utils/interface.h:70) — ALL four
        compressed streams (doc, tf, doclen, positions)."""
        row = (
            self.postings()
            .agg(
                (F.sum("doc_bytes") + F.sum("tf_bytes") + F.sum("dl_bytes")
                 + F.sum("pos_bytes")).alias("sz")
            )
            .first()
        )
        return int(row["sz"] or 0)

    def size_report(self) -> dict:
        """Compression accounting vs the corpus (the reference's bits/char +
        %-of-text report, utils/build_index.c:66-68): bits per indexed token
        and index bytes as a percentage of corpus text bytes."""
        return {
            "index_bytes": self.meta.get("index_bytes"),
            "corpus_bytes": self.meta.get("corpus_bytes"),
            "n_tokens": self.meta.get("n_tokens"),
            "bits_per_token": self.meta.get("bits_per_token"),
            "index_pct_of_corpus": self.meta.get("index_pct_of_corpus"),
        }
