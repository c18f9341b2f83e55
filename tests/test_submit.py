"""End-to-end smoke of the north_rule's ship path: ``spark-submit
--py-files`` (tools/submit.sh) with the engine imported ONLY from the
zipped package — the job runs from a scratch cwd with PYTHONPATH
stripped, so a packaging defect (missing module, repo-relative data
dependency, import-time cwd assumption) fails here instead of on a real
cluster.  Covers build → open → BM25 end to end inside the submitted
job, including the mapInPandas kernel (python workers must also resolve
the package from the zip).
"""

from __future__ import annotations

import os
import subprocess
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()  # master comes from spark-submit

    import full_text_index_spark
    assert ".zip" in (full_text_index_spark.__file__ or ""), (
        "package must resolve from the --py-files zip, got %r"
        % full_text_index_spark.__file__
    )

    from full_text_index_spark.build import build_index, prepare_corpus
    from full_text_index_spark.corpus import generate_corpus_pdf
    from full_text_index_spark.index import InvertedIndex
    from full_text_index_spark.query import bm25_topk
    from full_text_index_spark.tokenizer import tokenize_py

    out_dir = sys.argv[1]
    corpus = prepare_corpus(spark.createDataFrame(generate_corpus_pdf(80, seed=7)))
    build_index(spark, corpus, out_dir, n_segments=2, block_size=16)
    idx = InvertedIndex.open(spark, out_dir)

    text0 = corpus.select("text").limit(1).collect()[0][0]
    terms = tokenize_py(text0)[:2]
    queries = spark.createDataFrame([(0, terms)], "qid int, terms array<string>")
    rows = bm25_topk(idx, queries, k=5).collect()
    assert rows, "submitted BM25 job returned no rows"
    print(f"SUBMIT_OK rows={len(rows)}")
    """
)


def test_spark_submit_py_files(tmp_path):
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # Keep the submitted JVM small and non-interactive inside the test run.
    env["SPARK_SUBMIT_OPTS"] = "-Dspark.ui.enabled=false"
    proc = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "tools", "submit.sh"),
            "local[4]",
            str(job),
            str(tmp_path / "idx"),
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_OK rows=" in proc.stdout, proc.stdout[-2000:]
