"""Operator library.

- ``aggregate``  : RaQL's Aggregate operation — the general
                   COMMIT/FLUSH stateful engine + the native
                   tumbling-window fast path (SURVEY §2.2).
- ``windows``    : event-time tumbling/sliding windows, timeseries
                   regular-grid bucketing, EVERY clock.
- ``series``     : ordered stateful functions (LAG, SMOOTH, MOVEAVG,
                   DERIVE, HYSTERESIS, ONE OUT OF, PAST, SAMPLE ...)
                   as window expressions / grouped pandas folds.
- ``topk``       : TOP n heavy hitters (exact + decayed) and
                   LARGEST/SMALLEST/LATEST.
- ``dedup``      : exact + near-duplicate detection (minhash-LSH,
                   simhash, n-gram jaccard, embedding cosine).
- ``similarity`` : ANN search over embedding columns (brute-force
                   top-k baseline, LSH-bucketed scale path).
- ``multimodal`` : binary media columns — schema, batch plumbing,
                   stubbed decoders.
- ``asof``       : point-in-time (as-of) join via the union+window
                   trick — one shuffle, no range probe.
- ``rangejoin``  : point-in-interval join via bucket explosion —
                   equi-join scale shape for BETWEEN predicates Spark
                   would otherwise nested-loop.
- ``sketch``     : deterministic KMV (bottom-k) distinct-count
                   sketch — map-side bounded prefilter, one tiny
                   Exchange, oracle-exact unlike HLL — plus KMV set
                   algebra (union/intersection/Jaccard between two
                   sketches), the bottom-k quantile sketch, and the
                   count-min frequency sketch (bounded
                   depth×width-cell shuffle) with CMS heavy hitters.
- ``sampling``   : corpus-mixing samplers — temperature quotas, DSIR
                   importance, CCNet perplexity strata, token-budget
                   prefix selection, deterministic A-ES weighted
                   sampling without replacement.
- ``bloom``      : deterministic Bloom filter as a (word, bits)
                   relation — broadcast join pruning with no false
                   negatives; double-hashed, SQL-checkable.
- ``sortbuf``    : SORT LAST n bounded reorder buffer
                   (src/RamenSortBuf.ml semantics).
"""
