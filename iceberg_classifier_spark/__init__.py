"""PySpark-native analytics engine with the query/data-processing surface of
the Iceberg-Classifier reference (Kaggle Statoil SAR classification pipeline),
re-expressed Spark-first, plus large-scale training-data-pipeline operators.
"""

__version__ = "0.1.0"
