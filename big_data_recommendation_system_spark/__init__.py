"""PySpark-native analytics engine with the capabilities of
FreddyRE/big_data_recommendation_system (medallion e-commerce
recommendation platform), rebuilt Spark-first.

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    config      event vocabularies, weight maps, bin edges (SURVEY.md §0, §2.4)
    sources     parquet/JSON-lines readers, schemas, partitioned sinks
    functions   pandas-parity scalar helpers + text/vector functions
    operators   dedup family, windows, top-k, similarity search
    plans       silver/gold/relational logical plans (DataFrame builders)
    quality     declarative data-quality rule engine -> Column predicates
    streaming   Structured Streaming feature processor
    ml          ALS recommender + item similarity
"""

__version__ = "0.1.0"
