from spark_data_engineering_spark.plans.dag import Dataset, Node, Registry, Runner

__all__ = ["Dataset", "Node", "Registry", "Runner"]
