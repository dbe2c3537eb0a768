"""oni_ml_spark — PySpark-native analytics engine with the query and
data-processing capabilities of Open-Network-Insight/oni-ml.

Built Spark-first: DataFrame/SQL declarative plans, Catalyst-optimized,
no RDD detours, in-cluster LDA (pyspark.ml) instead of the reference's
external MPI LDA-C process (reference: OniLDACWrapper.scala:63-84).
"""

__version__ = "0.1.0"
