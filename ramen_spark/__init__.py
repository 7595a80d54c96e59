"""ramen_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rixed/ramen (reference surveyed in
SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, arrow, UTC).
- ``catalog``    : loaders for the synthetic star schema in /root/testdata.
- ``functions/`` : RaQL's stateless expression library as Column helpers
                   (scalar, network, text analysis, vector math).
- ``operators/`` : the relational / streaming operator set — RaQL's
                   Aggregate with COMMIT/FLUSH semantics, windows,
                   top-k heavy hitters, dedup family, similarity search,
                   stateful series functions (lag/smooth/moveavg/...).
- ``sources/``   : CSV (RaQL option surface), file glob, kafka (gated),
                   collectd/netflow fixed schemas.
- ``streaming/`` : Structured Streaming equivalents (event-time windows,
                   general commit processor, EVERY clock).
- ``plans/``     : RaQL program surface → DataFrame compilation.

Everything is DataFrame-first: the logical plan is declared via
pyspark.sql and Catalyst/Tungsten choose the physical strategy; Pandas
UDFs appear only where built-ins cannot express the semantics
(documented per call site).
"""

from ramen_spark.session import get_spark
from ramen_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
