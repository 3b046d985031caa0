"""Suite interop — import expectation definitions from other DQ
ecosystems so a team can switch engines without retyping its checks.

``from_great_expectations`` maps the widely-published Great
Expectations suite JSON (the ``expectation_suite_name`` +
``expectations: [{expectation_type, kwargs}]`` shape, stable across
GE 0.13–0.18 and documented publicly) onto this engine's constraint
kinds.  Mapping is STRICT: an expectation type with no faithful
counterpart raises with the list of unmapped types — silently
dropping a check would let a migration pass validation it never ran
(the same fail-loud stance as run_validation's unsupported-kind
guard).  ``mostly`` < 1.0 is rejected for row-level kinds for the
same reason (this engine's row kinds are exact; a tolerated-failure
budget belongs in an explicit completeness/metric assertion).

Mapped types (kwargs → params):

* expect_column_values_to_not_be_null      → not_null (mostly<1 →
  completeness with min_ratio=mostly)
* expect_column_values_to_be_between       → bounds {min,max}
* expect_column_values_to_be_in_set        → in_domain {values}
* expect_column_values_to_match_regex      → pattern {pattern}
* expect_column_values_to_be_unique        → unique {keys:[column]}
* expect_compound_columns_to_be_unique     → unique {keys:[...]}
* expect_table_row_count_to_be_between     → row_count {min,max}
* expect_column_mean_to_be_between         → stat_bounds mean
* expect_column_min_to_be_between          → stat_bounds min
* expect_column_max_to_be_between          → stat_bounds max
* expect_column_stdev_to_be_between        → stat_bounds std
* expect_column_proportion_of_unique_values_to_be_between
                                           → distinctness unique_ratio
* expect_column_pair_values_A_to_be_greater_than_B
                                           → expression (or_equal)

GE ``row_condition`` (``condition_parser: "spark"``/"great_
expectations__experimental__") maps to this engine's ``where`` scope
verbatim when the parser is spark-SQL flavored.
"""

from __future__ import annotations

import json
from typing import Any

from data_validation_spark.plans.suite import (
    Component,
    Constraint,
    ValidationSuite,
)

_ROW_LEVEL = {"expect_column_values_to_not_be_null",
              "expect_column_values_to_be_between",
              "expect_column_values_to_be_in_set",
              "expect_column_values_to_match_regex"}


def _where(kw: dict) -> dict:
    cond = kw.get("row_condition")
    if not cond:
        return {}
    parser = kw.get("condition_parser", "spark")
    if parser not in ("spark", "great_expectations__experimental__"):
        raise ValueError(
            f"row_condition parser {parser!r} is not spark-SQL "
            "flavored; rewrite the condition as a Spark SQL boolean")
    return {"where": cond}


def from_great_expectations(suite_json: str | dict,
                            partition_cols: list[str] | None = None
                            ) -> ValidationSuite:
    """Build a ValidationSuite from a GE expectation-suite JSON
    document (string or parsed dict).  Constraint names are
    ``<expectation_type>_<column|index>`` — stable across re-imports
    so manifests and metric sinks line up run over run."""
    d: dict[str, Any] = (json.loads(suite_json)
                        if isinstance(suite_json, str) else suite_json)
    name = d.get("expectation_suite_name", "ge_suite")
    unmapped: list[str] = []
    constraints: list[Constraint] = []

    for i, exp in enumerate(d.get("expectations", [])):
        et = exp.get("expectation_type", "")
        kw = dict(exp.get("kwargs", {}))
        col = kw.get("column")
        cname = f"{et}_{col or i}"
        mostly = kw.get("mostly")

        if et in _ROW_LEVEL and mostly is not None and mostly < 1.0:
            if et == "expect_column_values_to_not_be_null":
                constraints.append(Constraint(
                    cname, "completeness",
                    {"component": col, "min_ratio": float(mostly),
                     **_where(kw)}))
                continue
            raise ValueError(
                f"{et} with mostly={mostly}: this engine's row-level "
                "kinds are exact; express the tolerance as an explicit "
                "completeness/metric assertion instead")

        if et == "expect_column_values_to_not_be_null":
            constraints.append(Constraint(
                cname, "not_null", {"component": col, **_where(kw)}))
        elif et == "expect_column_values_to_be_between":
            p: dict[str, Any] = {"component": col, **_where(kw)}
            if kw.get("min_value") is not None:
                p["min"] = kw["min_value"]
            if kw.get("max_value") is not None:
                p["max"] = kw["max_value"]
            constraints.append(Constraint(cname, "bounds", p))
        elif et == "expect_column_values_to_be_in_set":
            constraints.append(Constraint(
                cname, "in_domain",
                {"component": col, "values": list(kw["value_set"]),
                 **_where(kw)}))
        elif et == "expect_column_values_to_match_regex":
            constraints.append(Constraint(
                cname, "pattern",
                {"component": col, "pattern": kw["regex"], **_where(kw)}))
        elif et == "expect_column_values_to_be_unique":
            constraints.append(Constraint(
                cname, "unique", {"keys": [col], **_where(kw)}))
        elif et == "expect_compound_columns_to_be_unique":
            constraints.append(Constraint(
                cname, "unique",
                {"keys": list(kw["column_list"]), **_where(kw)}))
        elif et == "expect_table_row_count_to_be_between":
            p = {**_where(kw)}
            if kw.get("min_value") is not None:
                p["min"] = kw["min_value"]
            if kw.get("max_value") is not None:
                p["max"] = kw["max_value"]
            constraints.append(Constraint(cname, "row_count", p))
        elif et in ("expect_column_mean_to_be_between",
                    "expect_column_min_to_be_between",
                    "expect_column_max_to_be_between",
                    "expect_column_stdev_to_be_between"):
            stat = {"expect_column_mean_to_be_between": "mean",
                    "expect_column_min_to_be_between": "min",
                    "expect_column_max_to_be_between": "max",
                    "expect_column_stdev_to_be_between": "std"}[et]
            p = {"component": col, "stat": stat, **_where(kw)}
            if kw.get("min_value") is not None:
                p["min"] = kw["min_value"]
            if kw.get("max_value") is not None:
                p["max"] = kw["max_value"]
            constraints.append(Constraint(cname, "stat_bounds", p))
        elif et == ("expect_column_proportion_of_unique_values_"
                    "to_be_between"):
            p = {"columns": [col], "metric": "unique_ratio",
                 **_where(kw)}
            if kw.get("min_value") is not None:
                p["min"] = kw["min_value"]
            if kw.get("max_value") is not None:
                p["max"] = kw["max_value"]
            constraints.append(Constraint(cname, "distinctness", p))
        elif et == "expect_column_pair_values_A_to_be_greater_than_B":
            op = ">=" if kw.get("or_equal") else ">"
            a, b = kw["column_A"], kw["column_B"]
            sql = f"({a}) {op} ({b})"
            w = _where(kw)
            if "where" in w:
                sql = f"NOT ({w['where']}) OR ({sql})"
            constraints.append(Constraint(cname, "expression",
                                          {"sql": sql}))
        else:
            unmapped.append(et)

    if unmapped:
        raise ValueError(
            "unmapped Great Expectations types (a silently dropped "
            f"check is a check that never ran): {sorted(set(unmapped))}")
    # stat_bounds reads the fused profile, so every target column must
    # exist as a declared numeric component — auto-declare them (GE
    # suites carry no component model of their own)
    comps = []
    seen: set[str] = set()
    for c in constraints:
        if c.kind == "stat_bounds" and c.params["component"] not in seen:
            seen.add(c.params["component"])
            comps.append(Component(c.params["component"], "numeric"))
    return ValidationSuite(name=name, components=comps,
                           constraints=constraints,
                           partition_cols=list(partition_cols or []))
