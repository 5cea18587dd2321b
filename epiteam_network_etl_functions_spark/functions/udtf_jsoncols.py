"""Spark 4 Python UDTF with a static ``analyze()`` — DYNAMIC output
schema resolved at plan time from a constant argument.

The third and last UDTF API form (scalar-args: udtf_ngrams.py;
TABLE-argument: udtf_sessionize.py): ``analyze`` receives the call's
arguments at analysis time and RETURNS THE OUTPUT SCHEMA, so

    SELECT j.* FROM events t, LATERAL json_cols(t.props, 'k,missing') j

yields one string column per requested key — the schema-on-demand JSON
flattening pattern (a fixed-schema UDTF cannot express it; the JVM
equivalent is ``from_json`` with a hand-written schema literal).
Missing keys yield NULL columns, never errors.

``udtf_dynamic_json_cols`` locks it against ``get_json_object`` /
DuckDB ``json_extract_string``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
from pyspark.sql.types import StringType, StructField, StructType


@udtf
class JsonCols:
    """json_cols(props_json, 'k1,k2,...') -> one row with one string
    column per key (stringified scalar values, NULL for absent keys or
    unparsable documents)."""

    @staticmethod
    def analyze(props: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
        if not isinstance(keys.value, str) or not keys.value:
            raise ValueError(
                "json_cols: the key list must be a non-empty constant string"
            )
        fields = [
            StructField(k.strip(), StringType(), True)
            for k in keys.value.split(",")
        ]
        return AnalyzeResult(StructType(fields))

    def eval(self, props, keys):
        import json

        names = [k.strip() for k in keys.split(",")]
        try:
            obj = json.loads(props) if props else {}
        except (TypeError, ValueError):
            obj = {}
        if not isinstance(obj, dict):
            obj = {}
        out = []
        for k in names:
            v = obj.get(k)
            if v is None:
                out.append(None)
            elif isinstance(v, bool):
                out.append("true" if v else "false")
            elif isinstance(v, (dict, list)):
                out.append(json.dumps(v, sort_keys=True))
            else:
                out.append(str(v))
        yield tuple(out)


def register_jsoncols_udtf(spark: SparkSession, name: str = "json_cols") -> None:
    spark.udtf.register(name, JsonCols)
