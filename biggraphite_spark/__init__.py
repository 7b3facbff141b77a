"""biggraphite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of criteo/biggraphite.

Design (see SURVEY.md): the reference's storage/query machinery (Cassandra
wide rows, SASI/Lucene/ES name indexes, twisted reactors, LMDB caches) is
replaced by DataFrame/SQL plans on columnar Parquet.  The semantics — metric
model, retention stages, the 5 aggregators with their partial/final split,
Graphite glob matching, window alignment — are reimplemented exactly, as a
pure-Python kernel (`model`, `globs`) plus Spark Column-expression builders
(`functions`), with the heavy lifting delegated to Catalyst.

Layout:
    model.py       pure-Python semantics kernel (Stage/Retention/Aggregator)
    globs.py       Graphite glob -> regex + pushdown-predicate compiler
    session.py     SparkSession builder tuned for this engine
    catalog.py     metrics-catalog DataFrame construction (p0..pN, depth, parent)
    functions/     Column-expression builders (aggregators, name functions)
    sources/       loaders: testdata parquet, events->points derivation
    operators/     query operators (downsample, fetch, find, gapfill, ...)
    plans/         plan-time logic (stage selection / window alignment)
    streaming/     Structured Streaming ingest path
"""

__version__ = "0.1.0"
