"""Score-boosting formula compiler: JSON formula AST -> pyspark Column.

Reference: ``ParsedExpression`` and the rescore-formula evaluator
(lib/segment/src/index/query_optimization/rescore_formula/parsed_formula.rs:
55-128; REST shape in lib/api/src/rest/schema.rs ``FormulaQuery``). The
formula is evaluated per point against the prefetch scores (``$score`` /
``$score[i]``), payload fields, filter-condition indicators, geo distance,
and datetime differences.

Supported AST (qdrant JSON shape):
- constant number, ``"$score"`` / ``"$score[i]"``, payload key string
- {"mult": [...]}, {"sum": [...]}, {"div": {"left":, "right":,
  "by_zero_default":}}, {"neg": e}, {"abs": e}, {"sqrt": e},
  {"pow": {"base":, "exponent":}}, {"exp": e}, {"ln": e}, {"log10": e}
- {"geo_distance": {"origin": {lat, lon}, "to": key}} — meters, haversine
- {"datetime": "..."} / {"datetime_key": key} — for date arithmetic;
  differences come out in seconds when two datetimes are subtracted (we
  surface this as ``sum``/``neg`` over datetime expressions)
- {"decay": {"kind": lin|exp|gauss, "x": e, "target": e, "scale": s,
  "midpoint": m}} — decay kernels (DecayKind parsed_formula.rs:95-103):
  every kernel maps |x - target| to (0, 1], value 0.5 at ``scale`` for
  exp/gauss and linear-to-zero at ``scale`` for lin (midpoint
  configurable, default 0.5)
- a bare condition dict (e.g. {"key":..., "match":...}) — indicator 1/0

Missing payload values: the reference substitutes per-variable defaults
(``defaults`` map) or errors; we take an optional defaults map and
otherwise let NULL propagate (callers coalesce).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_spark.filters import FieldResolver, haversine_meters, _compile_condition


class FormulaCompiler:
    def __init__(self, schema, score_cols: list[str] | None = None,
                 defaults: dict[str, Any] | None = None):
        self.fr = FieldResolver(schema)
        self.score_cols = score_cols or ["score"]
        self.defaults = defaults or {}

    def _var(self, name: str) -> Column:
        if name == "$score" or name == "$score[0]":
            c = F.col(self.score_cols[0])
        elif name.startswith("$score[") and name.endswith("]"):
            i = int(name[7:-1])
            if i >= len(self.score_cols):
                raise ValueError(f"no prefetch score {name}")
            c = F.col(self.score_cols[i])
        else:
            c, typ = self.fr.resolve(name)
            from pyspark.sql import types as T

            if isinstance(typ, T.ArrayType):  # first value of array payloads
                c = F.element_at(c, 1)
        if name in self.defaults:
            c = F.coalesce(c, F.lit(self.defaults[name]))
        return c.cast("double")

    def compile(self, expr: Any) -> Column:
        if isinstance(expr, (int, float)) and not isinstance(expr, bool):
            return F.lit(float(expr))
        if isinstance(expr, str):
            return self._var(expr)
        if not isinstance(expr, dict):
            raise ValueError(f"bad formula node: {expr!r}")
        if "mult" in expr:
            out = F.lit(1.0)
            for e in expr["mult"]:
                out = out * self.compile(e)
            return out
        if "sum" in expr:
            out = F.lit(0.0)
            for e in expr["sum"]:
                out = out + self.compile(e)
            return out
        if "div" in expr:
            d = expr["div"]
            left, right = self.compile(d["left"]), self.compile(d["right"])
            res = left / right
            if "by_zero_default" in d:
                res = F.when(right == 0, F.lit(float(d["by_zero_default"]))).otherwise(res)
            return res
        if "neg" in expr:
            return -self.compile(expr["neg"])
        if "abs" in expr:
            return F.abs(self.compile(expr["abs"]))
        if "sqrt" in expr:
            return F.sqrt(self.compile(expr["sqrt"]))
        if "pow" in expr:
            return F.pow(self.compile(expr["pow"]["base"]),
                         self.compile(expr["pow"]["exponent"]))
        if "exp" in expr:
            return F.exp(self.compile(expr["exp"]))
        if "ln" in expr:
            return F.log(self.compile(expr["ln"]))
        if "log10" in expr:
            return F.log10(self.compile(expr["log10"]))
        if "geo_distance" in expr:
            g = expr["geo_distance"]
            origin, key = g["origin"], g["to"]
            c, _ = self.fr.resolve(key)
            return haversine_meters(
                c["lat"], c["lon"], F.lit(float(origin["lat"])), F.lit(float(origin["lon"]))
            )
        if "datetime" in expr:
            return F.unix_timestamp(F.to_timestamp(F.lit(expr["datetime"]))).cast("double")
        if "datetime_key" in expr:
            c, _ = self.fr.resolve(expr["datetime_key"])
            return F.unix_timestamp(c).cast("double")
        for kind in ("lin_decay", "exp_decay", "gauss_decay"):
            if kind in expr:
                return self._decay(kind.split("_")[0], expr[kind])
        # otherwise: a filter condition used as a 0/1 indicator
        # (conditions are un-coalesced for pushdown; NULL counts as 0 here)
        return F.coalesce(
            _compile_condition(self.fr, expr), F.lit(False)
        ).cast("double")

    def _decay(self, kind: str, d: dict[str, Any]) -> Column:
        """Decay kernels (parsed_formula.rs lin/exp/gauss; midpoint default
        0.5, scale default 1.0, target default 0)."""
        x = self.compile(d["x"])
        target = self.compile(d.get("target", 0.0))
        scale = float(d.get("scale", 1.0))
        midpoint = float(d.get("midpoint", 0.5))
        diff = F.abs(x - target)
        if kind == "lin":
            # linear from 1 at target to `midpoint` at scale, floored at 0
            return F.greatest(
                F.lit(0.0), F.lit(1.0) - (F.lit((1.0 - midpoint) / scale)) * diff
            )
        if kind == "exp":
            lam = math.log(midpoint) / scale
            return F.exp(F.lit(lam) * diff)
        # gauss
        lam = math.log(midpoint) / (scale * scale)
        return F.exp(F.lit(lam) * diff * diff)


def rescore_formula(
    scored: DataFrame,
    formula: Any,
    *,
    score_cols: list[str] | None = None,
    defaults: dict[str, Any] | None = None,
    limit: int | None = None,
    id_col: str = "id",
    out_col: str = "score",
) -> DataFrame:
    """Re-score a result DataFrame with a formula over its columns; output
    ordered by the new score desc (formula scores are larger-better)."""
    comp = FormulaCompiler(scored.schema, score_cols=score_cols, defaults=defaults)
    new_score = comp.compile(formula)
    cols = [c for c in scored.columns if c != out_col]
    out = scored.select(*cols, new_score.alias(out_col))
    out = out.orderBy(F.col(out_col).desc(), F.col(id_col).asc())
    return out.limit(limit) if limit else out
