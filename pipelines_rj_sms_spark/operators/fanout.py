"""Nested-JSON entity fan-out: one payload row -> N relational tables.

The reference's lab-results ingestion parses one API payload into three
linked tables — solicitacoes, exames, resultados — carrying the parent
ids down as foreign keys (reference `cientificalab_api/tasks.py:100-200`,
a pandas loop over nested dicts). Spark-first this is `from_json` with
an explicit schema followed by one `explode` per nesting level: each
level is a narrow projection + generator, fully codegen'd, no Python in
the row path — the UDTF-like surface of SURVEY §2.12 expressed as plain
Catalyst operators.

Declare the hierarchy with `Entity`; `fan_out` returns one DataFrame per
entity. Parent key fields are propagated to every descendant as
``<parent_name>_<field>`` foreign-key columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Entity:
    """One level of the hierarchy.

    name: output-table name (also the FK prefix for descendants).
    key_fields: this entity's fields carried down to children.
    children: nested entities; ``array_field`` names the parent-struct
    field holding each child's array.
    """
    name: str
    key_fields: tuple[str, ...] = ()
    children: tuple[tuple[str, "Entity"], ...] = field(default=())


def fan_out(df: DataFrame, payload_col: str, schema: StructType,
            root: Entity, keep_empty_parents: bool = False,
            ) -> dict[str, DataFrame]:
    """Parse ``payload_col`` with ``schema`` and split the nested
    structure into one DataFrame per declared entity.

    ``keep_empty_parents=True`` uses explode_outer so a parent with an
    empty/null child array still yields a child row of nulls (left-join
    posture); default drops them (inner posture, the reference's loop
    behavior — no exames, no exame rows).
    """
    parsed = df.select(F.from_json(F.col(payload_col), schema).alias("_e"))
    out: dict[str, DataFrame] = {}
    _walk(parsed, root, [], out, keep_empty_parents)
    return out


def _walk(df: DataFrame, entity: Entity, inherited: list[str],
          out: dict[str, DataFrame], keep_empty: bool) -> None:
    struct_fields = [f.name for f in df.schema["_e"].dataType.fields]
    child_arrays = {array_field for array_field, _ in entity.children}
    scalars = [f for f in struct_fields if f not in child_arrays]
    out[entity.name] = df.select(
        *inherited, *[F.col(f"_e.{f}").alias(f) for f in scalars])

    explode = F.explode_outer if keep_empty else F.explode
    for array_field, child in entity.children:
        fk = [f"{entity.name}_{k}" for k in entity.key_fields]
        cdf = df.select(
            *inherited,
            *[F.col(f"_e.{k}").alias(n)
              for k, n in zip(entity.key_fields, fk)],
            explode(f"_e.{array_field}").alias("_e"),
        )
        _walk(cdf, child, inherited + fk, out, keep_empty)
