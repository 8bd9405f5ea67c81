"""Model registry: the engine's dbt.

Reference (`data_transformations/`): SQL models with Jinja ``ref()``
dependencies, materialized as ``table`` or ``view`` (`dbt_project.yml:
34-38`), built in dependency order from the manifest, with ``unique`` /
``not_null`` schema tests (`models/example/schema.yml:8-21`).

Engine realization (SURVEY.md §3.2 "Spark restatement"): a model is a
named builder function ``(spark, ref) -> DataFrame`` where ``ref(name)``
resolves upstream models; the registry topo-sorts the DAG and
materializes each model as a temp view (``view``) or a cached/persisted
DataFrame registered as a view (``table``).  The "manifest" is the
registry itself; Catalyst's analyzed plan replaces compiled SQL text.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Materialization = Literal["table", "view"]
RefFn = Callable[[str], DataFrame]
BuilderFn = Callable[[SparkSession, RefFn], DataFrame]


@dataclass
class Model:
    name: str
    builder: BuilderFn
    materialized: Materialization = "view"
    depends_on: tuple[str, ...] = ()
    tests: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # tests: {"unique": ("id",), "not_null": ("id",)}


class ModelRegistry:
    """Register models, build them in dependency order, run schema tests."""

    def __init__(self) -> None:
        self._models: dict[str, Model] = {}
        self._built: dict[str, DataFrame] = {}

    def register(
        self,
        name: str,
        builder: BuilderFn,
        materialized: Materialization = "view",
        depends_on: tuple[str, ...] = (),
        tests: dict[str, tuple[str, ...]] | None = None,
    ) -> None:
        if name in self._models:
            raise ValueError(f"duplicate model: {name}")
        self._models[name] = Model(name, builder, materialized, depends_on, tests or {})

    def build_order(self) -> list[str]:
        """Topological order of the ref() DAG (the dbt manifest's job)."""
        ts = TopologicalSorter({m.name: set(m.depends_on) for m in self._models.values()})
        return list(ts.static_order())

    def build(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Materialize every model in dependency order.

        ``view`` → temp view over the lazy plan (zero materialization,
        recomputed per query — reference `+materialized: view`);
        ``table`` → persisted via localCheckpoint-free cache + view (the
        local-mode analogue of `CREATE TABLE AS SELECT`; on a cluster
        with a metastore this would be ``saveAsTable``).
        """
        self._built.clear()

        def ref(name: str) -> DataFrame:
            if name not in self._built:
                raise KeyError(
                    f"ref({name!r}) before it was built — not in depends_on?"
                )
            return self._built[name]

        for name in self.build_order():
            model = self._models[name]
            df = model.builder(spark, ref)
            if model.materialized == "table":
                df = df.cache()
                df.count()  # force materialization, CTAS-style
            df.createOrReplaceTempView(name)
            self._built[name] = df
        return dict(self._built)

    def test(self, spark: SparkSession) -> dict[str, bool]:
        """dbt schema tests: zero-violating-rows assertions
        (`schema.yml:8-21` → SURVEY.md §2A.2 #15-16)."""
        if not self._built:
            self.build(spark)
        outcomes: dict[str, bool] = {}
        for model in self._models.values():
            df = self._built[model.name]
            for col in model.tests.get("unique", ()):
                dupes = df.groupBy(col).count().filter(F.col("count") > 1)
                outcomes[f"{model.name}.unique.{col}"] = dupes.isEmpty()
            for col in model.tests.get("not_null", ()):
                nulls = df.filter(F.col(col).isNull())
                outcomes[f"{model.name}.not_null.{col}"] = nulls.isEmpty()
        return outcomes


def example_models() -> ModelRegistry:
    """The reference's two example models, verbatim semantics.

    model 1 (`my_first_dbt_model.sql:10-21`): ``SELECT 1 AS id UNION ALL
    SELECT NULL`` materialized as table — the NULL row makes its
    ``not_null`` test fail BY DESIGN in the starter project (FIXTURES.md
    §A4); model 2 (`my_second_dbt_model.sql:4-6`): ``WHERE id = 1`` view.
    """
    reg = ModelRegistry()

    def first(spark: SparkSession, ref: RefFn) -> DataFrame:
        one = spark.sql("SELECT 1 AS id")
        null = spark.sql("SELECT CAST(NULL AS INT) AS id")
        return one.unionAll(null)

    def second(spark: SparkSession, ref: RefFn) -> DataFrame:
        return ref("my_first_dbt_model").filter(F.col("id") == 1)

    reg.register(
        "my_first_dbt_model",
        first,
        materialized="table",
        tests={"unique": ("id",), "not_null": ("id",)},
    )
    reg.register(
        "my_second_dbt_model",
        second,
        materialized="view",
        depends_on=("my_first_dbt_model",),
        tests={"unique": ("id",), "not_null": ("id",)},
    )
    return reg
