"""Schema-conformance cast layer — the reference caster, Spark-first.

Re-implements the semantics of
``/root/reference/arrow_pd_parser/caster.py`` (C1-C8 in SURVEY.md §2.4)
as a single ``df.select`` of JVM-side Column expressions — no UDFs, so
Catalyst folds the casts into the scan stage (whole-stage codegen):

* metadata dict -> Spark types, including the types the reference punts
  on (list/struct, caster.py:367,398-402 warn-only — here fully cast).
* bool truth table ``yes/no/true/t/false/f/1/1.0/0/0.0`` case- and
  whitespace-insensitive (caster.py:128-141), custom ``bool_map``
  override (caster.py:286).
* empty-string -> null for every non-string type (caster.py:60,139-148).
* str->timestamp/date with default formats ``%Y-%m-%d [%H:%M:%S]`` and
  per-column ``datetime_format`` (caster.py:25-68,396), strftime
  patterns translated to Spark datetime patterns.
* error policies per column: ``raise`` (fail the job via raise_error
  when a non-null value doesn't cast — the distributed analog of
  check_bool_mapping_errors caster.py:219-236), ``coerce`` (try_cast ->
  null), ``ignore`` (leave column unconverted).
* missing meta column -> ValueError (caster.py:568-569); partial
  schemas allowed with ``expect_full_schema=False``
  (_arrow_parsers.py:83-108); drop/ignore/partition columns and final
  meta-order projection (caster.py:527-529,556-605).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Truth table from /root/reference/arrow_pd_parser/caster.py:128-141.
DEFAULT_BOOL_MAP = {
    "yes": True, "no": False,
    "true": True, "false": False,
    "t": True, "f": False,
    "1": True, "0": False,
    "1.0": True, "0.0": False,
}

_STRFTIME_TO_SPARK = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
    ("%f", "SSSSSS"), ("%b", "MMM"), ("%B", "MMMM"), ("%a", "EEE"),
    ("%A", "EEEE"), ("%j", "DDD"), ("%p", "a"), ("%z", "xx"), ("%%", "%"),
]

DEFAULT_DATE_FORMAT = "yyyy-MM-dd"
DEFAULT_TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def strftime_to_spark(fmt: str) -> str:
    """``%d-%b-%y`` -> ``dd-MMM-yy`` (reference datetime_format keys)."""
    out = fmt
    for a, b in _STRFTIME_TO_SPARK:
        out = out.replace(a, b)
    if "%" in out:
        raise ValueError(f"unsupported strftime directive in {fmt!r}")
    return out


# ---------------------------------------------------------------------------
# Metadata type -> Spark type (C13: validate_and_enrich analog)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned: widen (Spark has no unsigned) — uint64 needs decimal(20,0)
    "uint8": T.ShortType(), "uint16": T.IntegerType(),
    "uint32": T.LongType(), "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(), "float32": T.FloatType(),
    "float64": T.DoubleType(), "float": T.FloatType(), "double": T.DoubleType(),
    "string": T.StringType(), "utf8": T.StringType(),
    "large_string": T.StringType(), "large_utf8": T.StringType(),
    "binary": T.BinaryType(), "large_binary": T.BinaryType(),
    "bool": T.BooleanType(), "bool_": T.BooleanType(), "boolean": T.BooleanType(),
    "date32": T.DateType(), "date64": T.DateType(), "date": T.DateType(),
    "null": T.NullType(),
}

_TS_RE = re.compile(r"^timestamp\((s|ms|us|ns)(?:,\s*tz=.*)?\)$")
_DECIMAL_RE = re.compile(r"^decimal(?:128|256)?\((\d+)\s*,\s*(-?\d+)\)$")
_BINARY_RE = re.compile(r"^binary\((\d+)\)$")
_TIME_RE = re.compile(r"^time(?:32|64)\((s|ms|us|ns)\)$")


def meta_type_to_spark(type_str: str) -> T.DataType:
    """Parse a mojap-metadata/arrow-style type string into a Spark type."""
    s = type_str.strip()
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if _TS_RE.match(s):
        return T.TimestampType()
    m = _DECIMAL_RE.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if _BINARY_RE.match(s):
        return T.BinaryType()
    if _TIME_RE.match(s):
        # Spark has no time-of-day type; keep as string (downgrade policy,
        # same spirit as validate_arrow_schema _arrow_parsers.py:56-80)
        return T.StringType()
    if s.startswith("list<") and s.endswith(">"):
        return T.ArrayType(meta_type_to_spark(s[5:-1]))
    if s.startswith("large_list<") and s.endswith(">"):
        return T.ArrayType(meta_type_to_spark(s[11:-1]))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top_level(s[7:-1]):
            name, _, ftype = part.partition(":")
            fields.append(T.StructField(name.strip(), meta_type_to_spark(ftype)))
        return T.StructType(fields)
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top_level(s[4:-1])
        return T.MapType(meta_type_to_spark(k), meta_type_to_spark(v))
    raise ValueError(f"unsupported metadata type: {type_str!r}")


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<" or ch == "(":
            depth += 1
        elif ch == ">" or ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def metadata_to_spark_schema(metadata: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(c["name"], meta_type_to_spark(c["type"]), True)
            for c in metadata["columns"]
        ]
    )


# ---------------------------------------------------------------------------
# Per-column cast expressions (C2-C8)
# ---------------------------------------------------------------------------


def _empty_to_null(c: Column) -> Column:
    return F.when(F.trim(c.cast("string")) == "", None).otherwise(c)


def bool_expr(
    col: Column,
    colname: str,
    bool_map: dict | None = None,
    errors: str = "raise",
    src_type: T.DataType | None = None,
) -> Column:
    """String/numeric -> nullable boolean via the truth table (C6/C7).

    Numeric sources are stringified and pushed through the SAME truth
    table (matching the reference, which maps stringified numerics:
    1/1.0 -> true, 0/0.0 -> false, anything else honors the
    raise/coerce policy) — NOT Spark's cast('boolean'), which would
    silently map any nonzero value to true."""
    if isinstance(src_type, T.BooleanType):
        return col
    if isinstance(src_type, T.DecimalType):
        # decimal stringifies with its scale ("1.00"); go through
        # double so 1 -> "1.0" hits the truth table like other floats
        col = col.cast("double")
    mapping = {k.lower(): v for k, v in (bool_map or DEFAULT_BOOL_MAP).items()}
    norm = F.lower(F.trim(col.cast("string")))
    expr = F.when(col.isNull() | (norm == ""), F.lit(None).cast("boolean"))
    for k, v in mapping.items():
        expr = expr.when(norm == k, F.lit(bool(v)))
    if errors == "raise":
        expr = expr.otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"Error converting {colname!r} to boolean: unmapped value "),
                    col.cast("string"),
                )
            ).cast("boolean")
        )
    else:  # coerce
        expr = expr.otherwise(F.lit(None).cast("boolean"))
    return expr


def timestamp_expr(
    col: Column,
    colname: str,
    target: T.DataType,
    datetime_format: str | None = None,
    errors: str = "raise",
    src_type: T.DataType | None = None,
) -> Column:
    """String -> date/timestamp with reference default formats (C8)."""
    is_date = isinstance(target, T.DateType)
    if isinstance(src_type, (T.DateType, T.TimestampType)) or isinstance(
        src_type, T.TimestampNTZType if hasattr(T, "TimestampNTZType") else ()
    ):
        return col.cast(target)
    fmt = (
        strftime_to_spark(datetime_format)
        if datetime_format
        else (DEFAULT_DATE_FORMAT if is_date else DEFAULT_TS_FORMAT)
    )
    src = _empty_to_null(col.cast("string"))
    casted = F.try_to_timestamp(src, F.lit(fmt))
    if not datetime_format and not is_date:
        # reference accepts date-only strings in timestamp cols via
        # pd.to_datetime flexibility; mirror with a date-format fallback
        casted = F.coalesce(casted, F.try_to_timestamp(src, F.lit(DEFAULT_DATE_FORMAT)))
    if is_date:
        casted = casted.cast("date")
    if errors == "raise":
        bad = src.isNotNull() & casted.isNull()
        casted = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(f"Error converting {colname!r} to {'date' if is_date else 'timestamp'}: "),
                    src,
                )
            ).cast("date" if is_date else "timestamp")
        ).otherwise(casted)
    return casted


def numeric_expr(
    col: Column,
    colname: str,
    target: T.DataType,
    errors: str = "raise",
) -> Column:
    """String/any -> numeric with raise/coerce policy (C3/C4)."""
    src = _empty_to_null(col)
    casted = src.try_cast(target)
    if errors == "raise":
        bad = src.isNotNull() & casted.isNull()
        casted = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(f"Error converting {colname!r} to {target.simpleString()}: "),
                    src.cast("string"),
                )
            ).cast(target),
        ).otherwise(casted)
    return casted


def conform_column(
    col: Column,
    colname: str,
    target: T.DataType,
    src_type: T.DataType | None = None,
    *,
    num_errors: str = "raise",
    bool_errors: str = "raise",
    datetime_errors: str = "raise",
    bool_map: dict | None = None,
    datetime_format: str | None = None,
) -> Column:
    """Dispatch per type_category (C2, caster.py:354-417)."""
    if isinstance(target, T.BooleanType):
        if bool_errors == "ignore":
            return col
        return bool_expr(col, colname, bool_map, bool_errors, src_type)
    if isinstance(target, (T.DateType, T.TimestampType)):
        if datetime_errors == "ignore":
            return col
        if datetime_errors == "downgrade" and isinstance(target, T.DateType) and (
            src_type is None or isinstance(src_type, T.StringType)
        ):
            # uncastable-downgrade policy: the reference replaces
            # string->date32/date64 targets with string in the schema
            # instead of risking a cast error
            # (/root/reference/arrow_pd_parser/_arrow_parsers.py:56-80)
            return col.cast("string")
        if datetime_errors == "downgrade":
            datetime_errors = "coerce"
        return timestamp_expr(col, colname, target, datetime_format, datetime_errors, src_type)
    if isinstance(
        target,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        if num_errors == "ignore":
            return col
        return numeric_expr(col, colname, target, num_errors)
    if isinstance(target, T.StringType):
        return col.cast("string")
    # complex / binary: native Spark cast — the capability extension over
    # the reference's warn-and-skip (caster.py:398-402)
    return col.cast(target)


def cast_spark_table_to_schema(
    df: DataFrame,
    metadata: dict,
    *,
    ignore_columns: list[str] | None = None,
    drop_columns: list[str] | None = None,
    num_errors: str = "raise",
    bool_errors: str = "raise",
    datetime_errors: str = "raise",
    bool_map: dict | None = None,
    expect_full_schema: bool = True,
) -> DataFrame:
    """Whole-table conform (C1, caster.py:505-607): one select, meta order.

    Per-column overrides: a metadata column may carry
    ``datetime_format``, and the error-policy args accept either a str
    or a dict of {column: policy} (get_error_value caster.py:420-502).
    """
    ignore_columns = list(ignore_columns or [])
    drop_columns = list(drop_columns or [])
    partitions = list(metadata.get("partitions", []))
    src_types = {f.name: f.dataType for f in df.schema.fields}

    def policy(p, name, default="raise"):
        if isinstance(p, dict):
            return p.get(name, default)
        return p

    # 'raise_all' = the reference's collect-ALL-bad-values-then-raise
    # semantics: one eager validation pass over every flagged column,
    # ValueError listing counts + samples per column; afterwards the
    # per-row raise expressions can never fire.
    raise_all_cols = [
        c["name"]
        for c in metadata["columns"]
        if c["name"] in src_types
        and c["name"] not in drop_columns + ignore_columns + partitions
        and "raise_all"
        in (
            policy(num_errors, c["name"]),
            policy(bool_errors, c["name"]),
            policy(datetime_errors, c["name"]),
        )
    ]
    if raise_all_cols:
        raise_on_cast_errors(df, metadata, bool_map=bool_map, columns=raise_all_cols)

    def eff(p, name):
        p = policy(p, name)
        return "raise" if p == "raise_all" else p

    exprs: list[Column] = []
    for c in metadata["columns"]:
        name = c["name"]
        if name in drop_columns:
            continue
        if name not in src_types:
            if name in partitions or not expect_full_schema:
                continue
            raise ValueError(
                f"metadata column {name!r} not found in dataframe columns "
                f"{list(src_types)} (expect_full_schema=True)"
            )
        if name in ignore_columns or name in partitions:
            exprs.append(F.col(name))
            continue
        target = meta_type_to_spark(c["type"])
        exprs.append(
            conform_column(
                F.col(name),
                name,
                target,
                src_types.get(name),
                num_errors=eff(num_errors, name),
                bool_errors=eff(bool_errors, name),
                datetime_errors=eff(datetime_errors, name),
                bool_map=(bool_map or {}).get(name) if _is_per_col_map(bool_map) else bool_map,
                datetime_format=c.get("datetime_format"),
            ).alias(name)
        )
    return df.select(*exprs)


def _is_per_col_map(bool_map) -> bool:
    """bool_map may be {col: {str: bool}} (per-column) or flat {str: bool}."""
    if not bool_map:
        return False
    return all(isinstance(v, dict) for v in bool_map.values())


# ---------------------------------------------------------------------------
# Collect-all-errors raise mode (C7 full parity) + schema merge (C11)
# ---------------------------------------------------------------------------

_ERROR_SAMPLE_CAP = 20


def _bad_value_expr(
    col: Column,
    colname: str,
    target: T.DataType,
    src_type: T.DataType | None,
    bool_map: dict | None,
    datetime_format: str | None,
) -> Column | None:
    """Predicate: value is present but would not convert to ``target``.
    None when the target type cannot produce conversion errors."""
    if not isinstance(
        target,
        (T.BooleanType, T.DateType, T.TimestampType, T.ByteType, T.ShortType,
         T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType),
    ):
        return None
    if isinstance(src_type, T.BooleanType) and isinstance(target, T.BooleanType):
        return None
    coerced = conform_column(
        col, colname, target, src_type,
        num_errors="coerce", bool_errors="coerce", datetime_errors="coerce",
        bool_map=bool_map, datetime_format=datetime_format,
    )
    present = col.isNotNull() & (F.trim(col.cast("string")) != "")
    return present & coerced.isNull()


def collect_cast_errors(
    df: DataFrame,
    metadata: dict,
    *,
    bool_map: dict | None = None,
    columns: list[str] | None = None,
    sample_cap: int = _ERROR_SAMPLE_CAP,
) -> dict[str, dict]:
    """Gather EVERY column's unconvertible values in ONE distributed
    pass: per column a bad-row count plus a capped, sorted sample of
    the distinct offending values.

    This is the Spark shape of the reference's collect-all-then-raise
    behavior (check_bool_mapping_errors,
    /root/reference/arrow_pd_parser/caster.py:219-236): a row-level
    ``raise_error`` expression fails on the FIRST bad value, which is
    useless for debugging a dirty column — this reports them all.
    """
    src_types = {f.name: f.dataType for f in df.schema.fields}
    want = set(columns) if columns is not None else None
    aggs, names = [], []
    for c in metadata["columns"]:
        name = c["name"]
        if name not in src_types or (want is not None and name not in want):
            continue
        target = meta_type_to_spark(c["type"])
        per_col_bool = (
            (bool_map or {}).get(name) if _is_per_col_map(bool_map) else bool_map
        )
        bad = _bad_value_expr(
            F.col(name), name, target, src_types[name],
            per_col_bool, c.get("datetime_format"),
        )
        if bad is None:
            continue
        names.append((name, target.simpleString()))
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"__n_{name}"))
        aggs.append(
            F.slice(
                F.sort_array(F.collect_set(F.when(bad, F.col(name).cast("string")))),
                1, sample_cap,
            ).alias(f"__s_{name}")
        )
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    out = {}
    for name, tstr in names:
        n = row[f"__n_{name}"] or 0
        if n:
            out[name] = {"n_bad": int(n), "target": tstr, "sample": list(row[f"__s_{name}"])}
    return out


def raise_on_cast_errors(
    df: DataFrame,
    metadata: dict,
    *,
    bool_map: dict | None = None,
    columns: list[str] | None = None,
) -> None:
    """Run :func:`collect_cast_errors`; raise one ValueError naming
    every bad column with counts and value samples (reference message
    shape: "N values could not be cast ... Details: [...]")."""
    errs = collect_cast_errors(df, metadata, bool_map=bool_map, columns=columns)
    if errs:
        lines = [
            f"{e['n_bad']} values in column {name!r} could not be cast to "
            f"{e['target']}. Details (up to {_ERROR_SAMPLE_CAP}): {e['sample']}"
            for name, e in errs.items()
        ]
        raise ValueError("; ".join(lines))


def update_existing_metadata(current: dict, new: dict) -> dict:
    """Field-by-field schema merge (C11): update any column of
    ``current`` that also appears in ``new`` (new wins), keep
    current-only columns unchanged, IGNORE new-only columns, and
    preserve ``current``'s column order — the exact semantics of the
    reference's ``update_existing_schema``
    (/root/reference/arrow_pd_parser/_arrow_parsers.py:26-53), over
    metadata dicts instead of pa.Schema."""
    new_by_name = {c["name"]: c for c in new.get("columns", [])}
    merged = dict(current)
    merged["columns"] = [
        dict(new_by_name.get(c["name"], c)) for c in current.get("columns", [])
    ]
    return merged
