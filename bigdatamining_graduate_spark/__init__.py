"""bigdatamining_graduate_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``112598028/BigDataMining_graduate``
(surveyed in ``SURVEY.md``). Everything is declarative DataFrame / SQL:
Catalyst plans, Tungsten executes. Python UDFs appear only as
Arrow-vectorized ``pandas_udf`` in the few spots built-ins cannot express
the semantics (see ``operators/multimodal.py``).

Layout:
    session     — SparkSession factory (AQE + Arrow + UTC, scale-tuned confs)
    sources     — typed catalog over the fixture tables + csv/text readers/sinks
    functions   — column-expression libraries (text, vectors, hashing)
    operators   — composable DataFrame->DataFrame operators (stats, topk,
                  rollup, dedup, similarity, cooccur, multimodal)
    plans       — the declared query registry (QUERIES / ORACLE)
    streaming   — Structured Streaming jobs over the events table
    ml          — MLlib pipeline wrappers (ALS, KMeans, TF-IDF, MinHashLSH)
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
