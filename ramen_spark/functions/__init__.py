"""RaQL's stateless expression library as pyspark Column helpers.

Split by domain:
- ``scalar``  — math / string / time / conditional ops (SURVEY §2.3).
- ``network`` — Eth/IPv4/IPv6/CIDR helpers + GeoIP country lookup.
- ``text``    — text-analysis ops for document pipelines (language id,
                quality scoring, tokenization, fingerprints, shingles,
                minhash/simhash primitives).
- ``vectors`` — embedding/vector math (dot, cosine, norms) as built-in
                higher-order functions (JVM-side, no UDF).

Every helper returns a Column built from pyspark.sql.functions so the
expression stays inside whole-stage codegen; the handful of genuinely
non-expressible ops (sparkline rendering, strptime multi-format) are
Pandas UDFs and documented as such.
"""

from ramen_spark.functions import network, scalar, text, vectors  # noqa: F401
