from pgvectorscale_spark.plans.sql_frontend import VectorSql

__all__ = ["VectorSql"]
