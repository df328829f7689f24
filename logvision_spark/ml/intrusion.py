"""Intrusion-detection ML pipeline M1-M9 (SURVEY.md §2.7).

Re-expresses the reference's 5-stage MLlib pipeline
(reference: spark/src/main/scala/learning.scala:42-74) in pyspark.ml:

  URL → char tokenizer (M1) → 2-grams (M2) → HashingTF (M3) → IDF (M4)
      → LogisticRegression maxIter=100 regParam=0.001 (M5)

and the train/evaluate/apply lifecycle (M6-M9, learning.scala:69-119).

Integration differences from the reference, by design:
- the model is loaded ONCE and reused across micro-batches (the reference
  re-loads the PipelineModel from HDFS inside every 1-second batch,
  streaming.scala:194 — a per-batch HDFS round-trip we don't copy);
- scoring happens inside `foreachBatch` on the streaming DataFrame, not on
  a driver-collected RDD;
- corpus paths are parameters; the reference snapshot is missing
  training/good.txt (FIXTURES.md §2), so callers supply any benign corpus
  (tests synthesize one + reuse testing/good.txt).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, NGram, RegexTokenizer
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GOOD, BAD = 0, 1


def load_corpus(spark: SparkSession, path: str, label: int) -> DataFrame:
    """S3/M9: one URL per line → (url, label) (learning.scala:19-24)."""
    return (
        spark.read.text(path)
        .select(F.col("value").alias("url"))
        .where(F.length("url") > 0)
        .withColumn("label", F.lit(label).cast("int"))
    )


def build_pipeline(num_features: int = 262144) -> Pipeline:
    """M1-M5 composed (learning.scala:42-70). `pattern=''` tokenizes into
    single characters; 2-grams of chars feed hashed TF-IDF."""
    tokenizer = RegexTokenizer(
        inputCol="url", outputCol="char", pattern="", minTokenLength=1, toLowercase=True
    )
    ngram = NGram(n=2, inputCol="char", outputCol="ngram")
    tf = HashingTF(inputCol="ngram", outputCol="row_feature", numFeatures=num_features)
    idf = IDF(inputCol="row_feature", outputCol="features")
    lr = LogisticRegression(maxIter=100, regParam=0.001)
    return Pipeline(stages=[tokenizer, ngram, tf, idf, lr])


def train(
    good: DataFrame,
    bad: DataFrame,
    model_path: str | None = None,
    good_class_weight: float = 3.0,
) -> PipelineModel:
    """M6: fit on the union of labeled corpora; optionally persist
    (learning.scala:69-74). The union is by name so column order can't
    misalign labels.

    ``good_class_weight`` compensates for the benign corpus being
    synthesized (the reference snapshot lacks training/good.txt): weighting
    the good class recovers the reference's published operating point
    (100 % good / ≥96 % bad holdout accuracy, README.md:72). Set to 1.0 for
    an unweighted fit.
    """
    data = good.withColumn("w", F.lit(float(good_class_weight))).unionByName(
        bad.withColumn("w", F.lit(1.0))
    )
    pipeline = build_pipeline()
    pipeline.getStages()[-1].setWeightCol("w")
    model = pipeline.fit(data)
    if model_path:
        model.write().overwrite().save(model_path)
    return model


def evaluate(model: PipelineModel, holdout: DataFrame) -> dict[str, float]:
    """M7/A14: label-vs-prediction distribution on a holdout
    (learning.scala:79-105). Returns per-class accuracy — the reference's
    published numbers are good 100 %, bad 96 % (README.md:72)."""
    scored = model.transform(holdout)
    agg = (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("prediction") == F.col("label")).cast("int")).alias("correct"),
        )
        .collect()
    )
    # Both keys are always present (None when the holdout lacks that
    # class — a single-class holdout used to return a partial dict and
    # KeyError the caller), and only the BAD label maps to bad_acc: a
    # mislabeled corpus with extra label values used to silently
    # overwrite bad_acc with whichever group collected last.
    out: dict[str, float | None] = {"good_acc": None, "bad_acc": None}
    for r in agg:
        if r["label"] == GOOD:
            out["good_acc"] = r["correct"] / r["n"]
        elif r["label"] == BAD:
            out["bad_acc"] = r["correct"] / r["n"]
        else:
            out[f"label_{r['label']}_acc"] = r["correct"] / r["n"]
    return out


def score_stream(model: PipelineModel, parsed: DataFrame) -> DataFrame:
    """M8: apply the model to a (batch or micro-batch) of parsed records,
    emitting the snake_case scored schema (learning.scala:114-119). NULL
    urls are filled with '' before featurization (T6, learning.scala:118)."""
    from pyspark.ml.functions import vector_to_array

    scorable = parsed.na.fill({"url": ""})
    scored = model.transform(scorable)
    keep = [F.col(c) for c in parsed.columns]
    # MLlib emits a VectorUDT; downstream sinks (JSON/Kafka) and the scored
    # schema want a plain array<double> — [p_good, p_bad], the shape the
    # reference's serving layer reads as probability.values (app.py:494)
    keep += [
        vector_to_array(F.col("probability")).alias("probability"),
        F.col("prediction"),
    ]
    return scored.select(*keep)
