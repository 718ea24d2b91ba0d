"""Binding registry (SURVEY.md S5): named external tables.

Yandex Query "bindings" register connection + path glob + format +
schema once, then queries refer to the name
(/root/reference/README.md:192-216, img/yq-s3-binding-1.png).  Spark
analog: a registry that materializes each binding as a temp view over
the right reader, so SQL can say ``FROM `metrica-hits-s3` `` exactly
like YQ.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import csvgz


@dataclass
class Binding:
    name: str
    path: str  # glob allowed
    fmt: str  # csv_with_names | parquet
    schema: T.StructType | None = None
    options: dict = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        if self.fmt == "csv_with_names":
            assert self.schema is not None, "bindings require a declared schema"
            return csvgz.read_csv(spark, self.path, self.schema, **self.options)
        if self.fmt == "parquet":
            return spark.read.parquet(self.path)
        raise ValueError(f"unsupported binding format: {self.fmt}")


class BindingRegistry:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._bindings: dict[str, Binding] = {}

    def register(self, binding: Binding) -> DataFrame:
        df = binding.load(self.spark)
        df.createOrReplaceTempView(binding.name.replace("-", "_"))
        self._bindings[binding.name] = binding
        return df

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name.replace("-", "_"))

    def names(self) -> list[str]:
        return sorted(self._bindings)
